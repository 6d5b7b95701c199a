"""PII redaction and Gopher-style repetition rules (llm/text)."""

from aos_spark.llm import text as TX


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_pii_counts_and_redaction(spark):
    df = _docs(
        spark,
        [
            (1, "mail a.b+c@ex-ample.co.uk or bob@x.io, ip 10.0.0.1 ok"),
            (2, "ssn 123-45-6789 phone 555-123-4567 done"),
            (3, "no pii here at all"),
        ],
    )
    out = {r.doc_id: r for r in TX.pii_features(df).collect()}
    assert (out[1].n_email, out[1].n_ip, out[1].n_ssn, out[1].n_phone) == (2, 1, 0, 0)
    assert out[1].redacted == "mail <EMAIL> or <EMAIL>, ip <IP> ok"
    assert (out[2].n_ssn, out[2].n_phone) == (1, 1)
    assert out[2].redacted == "ssn <SSN> phone <PHONE> done"
    assert out[3].redacted == out[3].text and out[3].n_email == 0


def test_pii_ssn_phone_shapes_disjoint(spark):
    df = _docs(spark, [(1, "555-123-4567"), (2, "123-45-6789")])
    out = {r.doc_id: r for r in TX.pii_features(df).collect()}
    assert (out[1].n_phone, out[1].n_ssn) == (1, 0)
    assert (out[2].n_phone, out[2].n_ssn) == (0, 1)


def test_repetition_stats_known_values(spark):
    df = _docs(
        spark,
        [
            (1, "a a a a a a"),          # 5 identical 2-grams, 2 identical 5-grams
            (2, "one two three four"),    # all 2-grams distinct, <5 tokens
            (3, "x y x y x y x y x y"),  # "x y"/"y x" alternate; 5-grams repeat
            (4, "solo"),                  # below both gram sizes
        ],
    )
    out = {r.doc_id: r for r in TX.repetition_stats(df).collect()}
    assert out[1].top_2gram_frac == 1.0
    assert out[1].dup_5gram_frac == 0.5          # 2 occurrences, 1 distinct
    assert out[2].top_2gram_frac == round(1 / 3, 6)
    assert out[2].dup_5gram_frac == 0.0
    assert out[3].top_2gram_frac == round(5 / 9, 6)
    # 6 5-gram occurrences, 2 distinct ("x y x y x", "y x y x y")
    assert out[3].dup_5gram_frac == round(1 - 2 / 6, 6)
    assert (out[4].top_2gram_frac, out[4].dup_5gram_frac) == (0.0, 0.0)
