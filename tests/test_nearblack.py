"""nearblack -nb 0 (apps/nearblack_lib.cpp): the groupBy-prefix form
vs a direct serial transliteration of the reference's four scans
(top-down vertical + left/right horizontal, then the bottom-up pass),
run to fixpoint the way the tool runs (replacement keeps pixels
near-black, so one pass suffices)."""

import numpy as np

from gdal_spark.queries import NB_DIST, NB_H, NB_W

SF = "/root/testdata/sf0.001"


def _fixture() -> np.ndarray:
    a = np.zeros((NB_H, NB_W))
    for py in range(NB_H):
        for px in range(NB_W):
            if (px < (py * 3) % 6 or px >= NB_W - (py * 5) % 7
                    or py < (px * 7) % 5 or py >= NB_H - (px * 11) % 6):
                a[py, px] = float((px + py) % 12)
            elif (px * 7 + py * 11) % 61 == 0 and px > 8 and py > 8:
                a[py, px] = 3.0
            else:
                a[py, px] = float(50 + (px * 13 + py * 29) % 200)
    return a


def _serial_reference(a: np.ndarray):
    """Direct nearblack_lib.cpp transliteration, nMaxNonBlack=0,
    single band, nNearDist=NB_DIST: top-down pass (vertical counts +
    left/right horizontal), then bottom-up pass. Replaced pixels
    become 0 (still near-black)."""
    v = a.copy()
    masked = np.zeros(a.shape, dtype=bool)

    def nb(x):
        return x <= NB_DIST

    for bottom_up in (False, True):
        counts = np.zeros(NB_W, dtype=int)
        lines = range(NB_H - 1, -1, -1) if bottom_up else range(NB_H)
        for py in lines:
            # vertical check
            for px in range(NB_W):
                if counts[px] > 0:
                    continue
                if not nb(v[py, px]):
                    counts[px] += 1
                    continue
                v[py, px] = 0.0
                masked[py, px] = True
            # horizontal: left->right then right->left (excl. end)
            for rng in (range(0, NB_W - 1), range(NB_W - 1, 0, -1)):
                run = 0
                for px in rng:
                    if not nb(v[py, px]):
                        run = counts[px] if counts[px] <= 0 else run + 1
                    if run > 0:
                        break
                    v[py, px] = 0.0
                    masked[py, px] = True
    return v, masked


def test_prefix_form_equals_serial_reference(spark):
    from gdal_spark.queries import q_nearblack
    a = _fixture()
    vref, mref = _serial_reference(a)
    got = {(r.py, r.px): (r.masked, r.out_val)
           for r in q_nearblack(spark, SF).collect()}
    assert len(got) == NB_H * NB_W
    for py in range(NB_H):
        for px in range(NB_W):
            m, ov = got[(py, px)]
            assert bool(m) == bool(mref[py, px]), (py, px)
            assert ov == vref[py, px], (py, px)


def test_interior_near_black_survives(spark):
    """Isolated interior near-black pixels are NOT collar."""
    from gdal_spark.queries import q_nearblack
    rows = {(r.py, r.px): r for r in q_nearblack(spark, SF).collect()}
    found = 0
    for (py, px), r in rows.items():
        if 8 < px < NB_W - 8 and 8 < py < NB_H - 8 \
                and (px * 7 + py * 11) % 61 == 0 and r.out_val == 3.0:
            assert r.masked == 0
            found += 1
    assert found > 0
    # and the collar is non-vacuous
    assert sum(r.masked for r in rows.values()) > 100
