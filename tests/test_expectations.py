

def test_quarantine_splits_rows_with_reasons(spark):
    from usgs_earthquake_data_pipeline_spark.operators.expectations import (
        Rule,
        quarantine,
    )

    df = spark.createDataFrame(
        [(1, "click", 10.0), (2, None, 5.0), (3, "bogus", -1.0), (4, "click", 2.0)],
        "id BIGINT, event_type STRING, value DOUBLE",
    )
    rules = [
        Rule("not_null", "event_type"),
        Rule("in_set", "event_type", values=("click", "purchase")),
        Rule("in_range", "value", lo=0.0, hi=100.0),
        Rule("unique", "id"),  # table-level: ignored by quarantine
    ]
    passed, bad = quarantine(df, rules)
    assert {r.id for r in passed.collect()} == {1, 4}
    reasons = {r.id: r.violated_rules for r in bad.collect()}
    assert reasons[2] == "not_null:event_type,in_set:event_type"
    assert reasons[3] == "in_set:event_type,in_range:value"
    # passed side has the original schema back
    assert set(passed.columns) == {"id", "event_type", "value"}


def test_quarantine_composes_with_validate_counts(spark):
    from usgs_earthquake_data_pipeline_spark.operators.expectations import (
        Rule,
        quarantine,
        validate,
    )

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)] + [(99, -5.0)],
        "id BIGINT, value DOUBLE",
    )
    rules = [Rule("in_range", "value", lo=0.0, hi=50.0)]
    passed, bad = quarantine(df, rules)
    report = {r.rule: r.violations for r in validate(df, rules).collect()}
    assert bad.count() == report["in_range:value"] == 1
    assert passed.count() == 10
