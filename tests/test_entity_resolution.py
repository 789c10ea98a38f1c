"""Sorted-neighborhood entity resolution (catalog entry
``dedup_sorted_neighborhood``): differential vs a pure-Python SNM
reference on generated part tables, plus structural bounds."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from usgs_earthquake_data_pipeline_spark.plans.catalog import CATALOG

_ADJ = ["red", "blue", "blu", "small", "smal", "hot", "hott"]
_NOUN = ["gear", "gears", "bolt", "bolts", "ring", "rng", "widget"]

_NAMES = st.lists(
    st.tuples(st.sampled_from(_ADJ), st.sampled_from(_NOUN)),
    min_size=2,
    max_size=40,
)

_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _py_snm(rows: list[tuple[int, str]], w: int = 3, thr: int = 4) -> Counter:
    """(a_name, b_name, dist) -> n_pairs over 2-char-prefix blocks."""
    blocks: dict[str, list[tuple[str, int]]] = {}
    for key, name in rows:
        blocks.setdefault(name[:2], []).append((name, key))
    out: Counter = Counter()
    for members in blocks.values():
        members.sort()
        for i, (name, _) in enumerate(members):
            for k in range(1, w):
                if i + k < len(members):
                    other = members[i + k][0]
                    d = _lev(name, other)
                    if d <= thr:
                        out[(name, other, d)] += 1
    return out


def _run(spark, rows):
    df = spark.createDataFrame(
        [(k, n, "B", "t", 1, 1.0) for k, n in rows],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="snm_")
    df.write.mode("overwrite").parquet(os.path.join(d, "part.parquet"))
    got = CATALOG["dedup_sorted_neighborhood"].spark_fn(spark, d).collect()
    return Counter({(r.a_name, r.b_name, r.dist): r.n_pairs for r in got})


@given(names=_NAMES)
@_SETTINGS
def test_snm_matches_python_reference(spark, names):
    rows = [(i, f"{a} {n}") for i, (a, n) in enumerate(names)]
    assert _run(spark, rows) == _py_snm(rows)


def test_snm_candidate_volume_bounded(spark, sf_dir):
    """SNM's contract: candidate pairs ≤ (w-1)·N — no quadratic
    blow-up inside big blocks (the failure mode of plain blocking)."""
    out = CATALOG["dedup_sorted_neighborhood"].spark_fn(spark, sf_dir).collect()
    from usgs_earthquake_data_pipeline_spark.sources.tables import load_table

    n = load_table(spark, sf_dir, "part").count()
    assert sum(r.n_pairs for r in out) <= 2 * n
    for r in out:
        assert 0 <= r.dist <= 4
        assert r.a_name[:2] == r.b_name[:2]  # same block by construction


def test_multipass_covers_forward_pass(spark, sf_dir):
    """Multipass recall contract: every canonical pair the forward
    pass finds is in the multipass output with in_forward set."""
    fwd = CATALOG["dedup_sorted_neighborhood"].spark_fn(spark, sf_dir).collect()
    multi = {
        (r.a_name, r.b_name): (r.in_forward, r.in_reverse)
        for r in CATALOG["dedup_snm_multipass"].spark_fn(spark, sf_dir).collect()
    }
    for r in fwd:
        a, b = sorted((r.a_name, r.b_name))
        if a == b:
            continue  # multipass drops self-pairs (exact dup names)
        assert (a, b) in multi and multi[(a, b)][0], (a, b)


def test_reverse_pass_recovers_prefix_typos(spark):
    """The point of the second key: two names differing only in their
    FIRST characters land in different forward blocks (pair missed)
    but share a reverse block (pair found)."""
    rows = [(1, "xsmall gear"), (2, "ysmall gear"), (3, "zz unrelated")]
    import os
    import tempfile

    df = spark.createDataFrame(
        [(k, n, "B", "t", 1, 1.0) for k, n in rows],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    d = tempfile.mkdtemp(prefix="snm_mp_")
    df.write.mode("overwrite").parquet(os.path.join(d, "part.parquet"))
    single = {
        (r.a_name, r.b_name)
        for r in CATALOG["dedup_sorted_neighborhood"].spark_fn(spark, d).collect()
    }
    multi = {
        (r.a_name, r.b_name): (r.in_forward, r.in_reverse)
        for r in CATALOG["dedup_snm_multipass"].spark_fn(spark, d).collect()
    }
    pair = ("xsmall gear", "ysmall gear")
    assert pair not in single  # forward blocking misses it
    assert pair in multi and multi[pair] == (False, True)
