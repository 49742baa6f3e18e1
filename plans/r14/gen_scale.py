"""Generate a k-replicated scale directory from an existing SF dir.

Purpose (round-14 verdict ask #7): at sf0.1 most bench queries finish
in 0.5-4 s and are stage-latency-bound, so the driver's 8-vs-32-core
scaling block measures scheduler overhead, not parallelism. This
script derives a deterministic larger dataset by replicating every
table k times with key-space offsets (foreign keys offset
consistently; the dimension tables region/nation are shared), so the
same bench contract can be pointed at it:

    python plans/r14/gen_scale.py /root/testdata/sf0.1 /root/scale/sf0.8 8
    SPARK_GRAFT_SF_DIR=/root/scale/sf0.8 SPARK_GRAFT_CPUS=32 python bench.py
    SPARK_GRAFT_SF_DIR=/root/scale/sf0.8 SPARK_GRAFT_CPUS=8  python bench.py

Replica r=0 is the identity copy; replica r>0 adds r*OFFSET to every
entity key (doc_id, vec_id, event_id, user_id, order/cust/part/supp
keys). Text/payload columns are left byte-identical, so replicas of a
document are exact duplicates under new ids — dedup operators see a
corpus with k-way duplicate structure (bounded: pair blowup is
C(k,2) per original duplicate class, linear in corpus size at fixed
k), which is a realistic shape for a dedup workload. Each table is
written as one parquet file per replica under a ``<name>.parquet/``
directory so scans get multiple splits.

Pure pyarrow — no Spark session, deterministic given the source dir.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

OFFSET = 10_000_000

#: table -> key columns to offset per replica (int64/int32 preserved)
KEYED = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
}
#: shared dimensions: copied once, never replicated
SHARED = ["region", "nation"]


def main() -> None:
    src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    for name in SHARED:
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        pq.write_table(t, os.path.join(dst, f"{name}.parquet"))
        print(f"{name}: copied {t.num_rows} rows")
    for name, keys in KEYED.items():
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        out_dir = os.path.join(dst, f"{name}.parquet")
        os.makedirs(out_dir, exist_ok=True)
        for r in range(k):
            rep = t
            if r > 0:
                for key in keys:
                    idx = rep.schema.get_field_index(key)
                    col = rep.column(key)
                    shifted = pc.add(col, pa.scalar(r * OFFSET, type=pa.int64()))
                    shifted = shifted.cast(rep.schema.field(key).type)
                    rep = rep.set_column(idx, rep.schema.field(key), shifted)
            pq.write_table(rep, os.path.join(out_dir, f"part-{r:03d}.parquet"))
        print(f"{name}: {t.num_rows} rows x {k} replicas")


if __name__ == "__main__":
    main()
