#!/usr/bin/env python
"""Build the pseudo-sf1 oracle-sweep input: documents + embeddings
replicated 10x with key-shifted ids (content kept IDENTICAL — an
adversarial exact-duplicate stress for the dedup/ANN family), all other
tables symlinked unchanged from the source sf dir.

Both engines read the same files, so a sweep mismatch is real
cross-engine divergence, never a data artifact.  Events/TPC-H tables
are NOT replicated: duplicating their timestamp/key space would trip
the engine's own as-of collision guard and break the determinism
assumptions (unique keys) the tie-breaking queries rely on.

Usage:
    python tools/make_sfbig.py [src_sf_dir] [dst_dir]
    SPARK_GRAFT_ORACLE_SF=<dst_dir> pytest tests/test_entry_contract.py

Round-5 result: 62/62 queries value-hash-exact at this scale (100x the
driver's sf0.01 gate), 38:55 wall.
"""

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPLICAS = 10
KEY_STRIDE = 1_000_000
UNCHANGED = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events",
]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/lps_sfbig"
    os.makedirs(dst, exist_ok=True)
    for t, key in [("documents", "doc_id"), ("embeddings", "vec_id")]:
        tab = pq.read_table(f"{src}/{t}.parquet")
        idx = tab.schema.get_field_index(key)
        parts = [
            tab.set_column(
                idx, key,
                pc.add(tab[key], pa.scalar(r * KEY_STRIDE, pa.int64())),
            )
            for r in range(REPLICAS)
        ]
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{dst}/{t}.parquet")
        print(t, out.num_rows)
    for t in UNCHANGED:
        link = f"{dst}/{t}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{src}/{t}.parquet", link)
    print("built", dst)


if __name__ == "__main__":
    main()
