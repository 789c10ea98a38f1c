"""Schema-compatible synthetic testdata generator (round-10 verdict
item 4: back the 100x scaling claim with an sf1 smoke).

Reproduces the DRIVER's table schemas and value domains (TESTDATA.md;
distributions sampled from /root/testdata/sf0.1) at an arbitrary scale
factor, seed-42 deterministic, written as one parquet per table via
pyarrow — no Spark needed. This is NOT the driver's generator and makes
no bit-compatibility claim; it exists so per-entry sf0.1 -> sf1 wall
ratios can be measured locally (tools/sf1_smoke.py) on data whose
schema, key relationships (FKs, fixed dims), and rough distributions
match the real test tables.

Usage: python tools/gen_testdata.py SF OUT_DIR [TABLE ...]
(e.g. 1 /tmp/sf1; or 10 /tmp/sf10 documents for a docs-only dir)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
PART_ADJ = ["large", "hot", "blue", "small", "red", "cold", "green", "dark"]
PART_NOUN = ["ring", "bolt", "gear", "pin", "cog", "washer", "nut", "rod"]
PART_TYPES = ["LARGE", "ECONOMY", "SMALL", "MEDIUM", "STANDARD", "PROMO"]
LANGS = (["en"] * 8) + ["zh", "zh", "fr", "fr", "es", "es", "de", "de"]
VOCAB = (
    "batch part spark line column order small sort fast value scan "
    "query agg table hash key group stream filter customer slow vector "
    "join shuffle broadcast window merge index cache plan"
).split()

US_DAY = 86_400_000_000


def _ts_array(us: np.ndarray) -> pa.Array:
    return pa.array(us.astype("int64"), type=pa.int64()).cast(
        pa.timestamp("us")
    )


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    # Row-group layout (r14): pyarrow's default writes ONE row group
    # per table at these sizes, and Spark cannot split a scan below a
    # row group — so every scan stage over a generated table ran on
    # one core no matter the cluster size, which flattened the
    # bench's 8-vs-32-core scaling rung to ~1x for scan-bound entries
    # (optimization guide §6: splits come from row groups). Cap row
    # groups at ~n/64 rows (floor 4096) so a local[32] scan — and any
    # real executor count — gets parallel splits. Content (values,
    # order, determinism) is unchanged; only the physical layout.
    rg = max(4096, table.num_rows // 64)
    pq.write_table(
        table, os.path.join(out_dir, f"{name}.parquet"), row_group_size=rg
    )
    print(f"  {name}: {table.num_rows} rows")


KNOWN_TABLES = frozenset(
    {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }
)


def generate(
    sf: float,
    out_dir: str,
    seed: int = 42,
    only: set[str] | None = None,
) -> None:
    """``only`` (round-12): generate just the named tables — the sf10
    smoke needs only `documents`, and drawing 60M lineitem rows to
    throw them away would dominate the run. Skipped tables' random
    draws are skipped too, so an `only` run is NOT stream-identical
    to the same tables out of a full run — fine for timing smokes
    (the distribution family is what matters), do not mix dirs."""
    rng = np.random.default_rng(seed)
    # Typo'd table names would otherwise "succeed" while generating
    # nothing, and a downstream smoke then reads an empty dir.
    if only is not None and (unknown := sorted(set(only) - KNOWN_TABLES)):
        raise SystemExit(
            f"unknown table name(s): {unknown}; "
            f"known: {sorted(KNOWN_TABLES)}"
        )
    os.makedirs(out_dir, exist_ok=True)

    def want(name: str) -> bool:
        return only is None or name in only

    n_cust = max(1, int(150_000 * sf))
    n_supp = max(1, int(10_000 * sf))
    n_part = max(1, int(200_000 * sf))
    n_ord = max(1, int(1_500_000 * sf))
    n_li = max(1, int(6_000_000 * sf))
    n_ev = max(1, int(1_000_000 * sf))
    n_doc = max(1, int(50_000 * sf))
    n_emb = max(1, int(20_000 * sf))
    n_users = max(1, int(15_000 * sf))

    if want("region") or want("nation"):
        _write(out_dir, "region", pa.table({
            "r_regionkey": pa.array(range(5), pa.int32()),
            "r_name": REGIONS,
        }))
        _write(out_dir, "nation", pa.table({
            "n_nationkey": pa.array(range(25), pa.int32()),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
        }))

    if want("customer"):
        _write(out_dir, "customer", pa.table({
            "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
            "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
            "c_nationkey": pa.array(
                rng.integers(0, 25, n_cust, dtype=np.int32), pa.int32()
            ),
            "c_acctbal": np.round(rng.uniform(-1000, 10_000, n_cust), 2),
            "c_mktsegment": pa.array(
                np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]
            ),
        }))
    if want("supplier"):
        _write(out_dir, "supplier", pa.table({
            "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
            "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
            "s_nationkey": pa.array(
                rng.integers(0, 25, n_supp, dtype=np.int32), pa.int32()
            ),
            "s_acctbal": np.round(rng.uniform(-1000, 10_000, n_supp), 2),
        }))
    if want("part"):
        _write(out_dir, "part", pa.table({
            "p_partkey": pa.array(np.arange(n_part), pa.int64()),
            "p_name": [
                f"{PART_ADJ[i % 8]} {PART_NOUN[(i // 8) % 8]}"
                for i in range(n_part)
            ],
            "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
            "p_type": pa.array(np.array(PART_TYPES)[rng.integers(0, 6, n_part)]),
            "p_size": pa.array(
                rng.integers(1, 51, n_part, dtype=np.int32), pa.int32()
            ),
            "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 2),
        }))

    base95 = np.datetime64("1995-01-01", "us").astype("int64")
    span_days = int((np.datetime64("2001-08-01") - np.datetime64("1995-01-01"))
                    / np.timedelta64(1, "D"))
    if want("orders") or want("lineitem"):
        o_date_day = rng.integers(0, span_days + 1, n_ord)
        _write(out_dir, "orders", pa.table({
            "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
            "o_custkey": pa.array(
                rng.integers(0, n_cust, n_ord, dtype=np.int64), pa.int64()
            ),
            "o_orderstatus": pa.array(
                np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)]
            ),
            "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
            "o_orderdate": _ts_array(base95 + o_date_day * US_DAY),
            "o_orderpriority": pa.array(
                np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]
            ),
        }))

    if want("lineitem"):
        li_order = rng.integers(0, n_ord, n_li, dtype=np.int64)
        ship_day = o_date_day[li_order] + rng.integers(1, 95, n_li)
        _write(out_dir, "lineitem", pa.table({
            "l_orderkey": pa.array(li_order, pa.int64()),
            "l_partkey": pa.array(
                rng.integers(0, n_part, n_li, dtype=np.int64), pa.int64()
            ),
            "l_suppkey": pa.array(
                rng.integers(0, n_supp, n_li, dtype=np.int64), pa.int64()
            ),
            "l_linenumber": pa.array(
                rng.integers(1, 8, n_li, dtype=np.int32), pa.int32()
            ),
            "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
            "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
            "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
            "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
            "l_returnflag": pa.array(
                np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]
            ),
            "l_linestatus": pa.array(
                np.array(["O", "F"])[rng.integers(0, 2, n_li)]
            ),
            "l_shipdate": _ts_array(base95 + ship_day * US_DAY),
        }))

    base24 = np.datetime64("2024-01-01", "us").astype("int64")
    if want("events"):
        ev_us = np.sort(rng.integers(0, 30 * US_DAY, n_ev))
        _write(out_dir, "events", pa.table({
            "event_id": pa.array(np.arange(n_ev), pa.int64()),
            "ts": _ts_array(base24 + ev_us),
            "user_id": pa.array(
                rng.integers(0, n_users, n_ev, dtype=np.int64), pa.int64()
            ),
            "event_type": pa.array(
                np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)]
            ),
            "value": np.round(
                np.minimum(rng.exponential(50.0, n_ev), 560.0), 2
            ),
            "props": [
                json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)
            ],
        }))

    if want("documents"):
        # documents: word salad over a 30-word vocab (high organic shingle
        # overlap, like the driver corpus) + ~1.5% near-dup copies so the
        # dedup headliners see true pairs at every SF
        lens = rng.integers(8, 100, n_doc)
        texts: list[str] = []
        for i in range(n_doc):
            words = np.array(VOCAB)[rng.integers(0, len(VOCAB), lens[i])]
            texts.append(" ".join(words))
        n_dup = max(1, n_doc // 64)
        dup_src = rng.integers(0, n_doc, n_dup)
        for j, s in enumerate(dup_src):
            # copy an earlier doc verbatim (half) or with one word changed
            t = texts[s]
            if j % 2:
                parts = t.split()
                parts[rng.integers(0, len(parts))] = VOCAB[j % len(VOCAB)]
                t = " ".join(parts)
            texts[n_doc - n_dup + j] = t
        _write(out_dir, "documents", pa.table({
            "doc_id": pa.array(np.arange(n_doc), pa.int64()),
            "text": texts,
            "lang": pa.array(np.array(LANGS)[rng.integers(0, len(LANGS), n_doc)]),
            "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }))

    if want("embeddings"):
        emb = rng.normal(0.0, 0.125, (n_emb, 64)).astype(np.float32)
        _write(out_dir, "embeddings", pa.table({
            "vec_id": pa.array(np.arange(n_emb), pa.int64()),
            "embedding": pa.array(list(emb), pa.list_(pa.float32())),
            "label": pa.array(
                rng.integers(0, 10, n_emb, dtype=np.int32), pa.int32()
            ),
        }))


if __name__ == "__main__":
    sf = float(sys.argv[1])
    out = sys.argv[2]
    # optional trailing args: table names to generate (e.g. documents)
    only = set(sys.argv[3:]) or None
    generate(sf, out, only=only)
    print(f"wrote sf{sf} to {out}" + (f" (only {sorted(only)})" if only else ""))
