"""Language-ID with real stopword-frequency profiles: genuine
sentences in each language must classify correctly."""

from gdal_spark.functions.text import langid

SENTENCES = [
    (1, "en", "the quick brown fox jumps over the lazy dog and runs "
              "to the river with all of his friends"),
    (2, "fr", "le chat est sur la table et il ne veut pas descendre "
              "dans la cuisine avec les autres"),
    (3, "es", "el perro corre por la calle y no quiere volver a la "
              "casa con los otros animales"),
    (4, "de", "der hund lauft durch die strasse und er will nicht "
              "mit den anderen in das haus"),
    (5, "zh", "wo men zai zhe ge hao de di fang chi le hen duo hao "
              "chi de dong xi ni ye lai ma"),
]


def test_real_sentences_classify(spark):
    df = spark.createDataFrame(
        [(i, t) for i, _, t in SENTENCES], "doc_id long, text string")
    got = {r["doc_id"]: r["pred_lang"] for r in langid(df).collect()}
    for i, want, _ in SENTENCES:
        assert got[i] == want, f"doc {i}: got {got[i]}, want {want}"


def test_no_profile_tokens_emits_nothing(spark):
    df = spark.createDataFrame(
        [(9, "xylophone zebra quartz")], "doc_id long, text string")
    assert langid(df).count() == 0
