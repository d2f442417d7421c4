"""Scale the driver's sf0.1 testdata up by key-shifted replication.

Produces an sfN-shaped dataset (default 10x => sf1: lineitem 6M rows)
under /tmp without touching the read-only source. Each replica i shifts
every key by i * (max_key_in_domain + 1), with ONE offset per key
DOMAIN shared across tables (orderkey: orders+lineitem, custkey:
customer+orders, suppkey: supplier+lineitem, partkey: part+lineitem),
so referential joins stay exactly as selective as the original —
replica-local joins never cross replicas, which is how dbgen itself
scales TPC-H (rows per key constant, keys grow with sf). nation/region
stay fixed (fixed-size in TPC-H at every sf); doc_id/vec_id/event_id/
user_id are their own single-table domains. Value columns are copied
verbatim: per-row distributions (and therefore per-query selectivity)
are sf-invariant.

Usage: python tools/scale_testdata.py [--factor 10] [--src DIR] [--out DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# key-domain -> [(table, column), ...]; one shift offset per domain
DOMAINS = {
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "dockey": [("documents", "doc_id")],
    "veckey": [("embeddings", "vec_id")],
    "eventkey": [("events", "event_id")],
    "userkey": [("events", "user_id")],
}
FIXED_TABLES = ("region", "nation")
ROW_GROUPS = 64


def _salt_tokens(texts, i: int):
    """Append ``z{i}`` to every ``[A-Za-z0-9]+`` token run of replica
    ``i`` (replica 0 stays verbatim). The engine-wide text tokenizer is
    lowercase [a-z0-9]+ runs, so each salted token stays ONE token and
    replicas become token-disjoint: within-replica duplicate/near-dup
    structure is preserved exactly (every token transforms identically
    everywhere) while cross-replica pairs vanish. Without this,
    verbatim replication makes every document 100-way identical and
    near-dup PAIR counts grow quadratically in the factor — measuring
    a degenerate corpus, not scale."""
    import re

    if i == 0:
        return texts
    suf = f"z{i}"
    pat = re.compile(r"[A-Za-z0-9]+")
    repl = lambda m: m.group(0) + suf  # noqa: E731
    return pa.array(
        [None if t is None else pat.sub(repl, t) for t in texts.to_pylist()],
        type=texts.type)


def scale(src: str, out: str, factor: int, only: set[str] | None = None,
          salt_text: dict[str, str] | None = None) -> None:
    """Scale ``src`` into ``out`` by ``factor``. ``only`` restricts to a
    subset of tables (e.g. {"documents"} for the text-corpus-only sf10
    used to measure floor amortization) — key domains touching excluded
    tables still shift consistently for the included ones. ``salt_text``
    maps table -> text column to token-salt per replica (see
    ``_salt_tokens``) for similarity/dedup workloads where verbatim
    replication degenerates."""
    os.makedirs(out, exist_ok=True)
    domains = {
        dom: [(t, c) for t, c in cols if only is None or t in only]
        for dom, cols in DOMAINS.items()
    }
    domains = {dom: cols for dom, cols in domains.items() if cols}
    offsets: dict[str, int] = {}
    for dom, cols in domains.items():
        hi = 0
        for table, col in cols:
            t = pq.read_table(os.path.join(src, f"{table}.parquet"), columns=[col])
            hi = max(hi, pc.max(t.column(col)).as_py() or 0)
        offsets[dom] = hi + 1
    shift_cols = {
        table: {col: offsets[dom] for dom, cols in domains.items()
                for t2, col in cols if t2 == table}
        for table in {t for cols in domains.values() for t, _ in cols}
    }
    for f in sorted(os.listdir(src)):
        if not f.endswith(".parquet"):
            continue
        name = f[:-8]
        if only is not None and name not in only:
            continue
        table = pq.read_table(os.path.join(src, f))
        if name in FIXED_TABLES:
            replicas = [table]
        else:
            replicas = []
            for i in range(factor):
                rep = table
                for col, off in shift_cols.get(name, {}).items():
                    idx = rep.schema.get_field_index(col)
                    shifted = pc.add(rep.column(col), pa.scalar(i * off))
                    rep = rep.set_column(idx, col, shifted.cast(rep.schema.field(col).type))
                tcol = (salt_text or {}).get(name)
                if tcol is not None and i > 0:
                    idx = rep.schema.get_field_index(tcol)
                    salted = _salt_tokens(rep.column(tcol).combine_chunks(), i)
                    rep = rep.set_column(idx, tcol, salted)
                replicas.append(rep)
        merged = pa.concat_tables(replicas)
        rg = max(4096, (merged.num_rows + ROW_GROUPS - 1) // ROW_GROUPS)
        dst = os.path.join(out, f)
        pq.write_table(merged, dst + ".tmp", row_group_size=rg)
        os.replace(dst + ".tmp", dst)
        # stderr: bench.py imports scale() and its stdout must stay a
        # single JSON line for the driver
        print(f"{name}: {table.num_rows} -> {merged.num_rows}", file=sys.stderr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None,
                    help="comma-separated table subset (e.g. documents)")
    args = ap.parse_args()
    out = args.out or f"/tmp/scaled_sf{args.factor}x"
    scale(args.src, out, args.factor,
          only=set(args.only.split(",")) if args.only else None)
    print(out)


if __name__ == "__main__":
    main()
