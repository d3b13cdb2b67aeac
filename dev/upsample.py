#!/usr/bin/env python3
"""Dev-only 10x scale-rehearsal data: key-shifted replication of the
deterministic sf0.1 corpus into an sf1-equivalent directory (r17 verdict
task 2). NOT used by any library code — timing rehearsal input only.

Replication semantics (copy i in 0..K-1):
 - every key column shifts by i * (max_key + 1), consistently across
   fact/dim tables, so the join structure is 10 disjoint replicas —
   per-key fan-outs (per-user activity, per-order lines) stay at their
   sf0.1 profile, matching how the real generator scales (more users,
   not heavier users). A naive un-shifted copy would multiply per-key
   fan-out and make quadratic-ish plans look super-linear for DATA
   reasons, not plan reasons.
 - documents: every 5th token is copy-tagged (deterministic lambda), so
   replicas are NOT near-duplicates of each other (k-shingle overlap
   dies with ~20% token churn) and the corpus keeps its original dup
   rate instead of jumping to 90%; n_chars recomputed. Copy 0 is
   verbatim.
 - embeddings: seeded per-copy Gaussian noise at 15% of the corpus'
   per-dim std, so ANN/semdedup see new points in the same
   distribution, not 10 coincident copies per vector. Copy 0 verbatim.
 - events: ts left unchanged — a bigger corpus over the same window
   means denser hours (how event streams actually grow); event_id and
   user_id shift.

Usage: python3 dev/upsample.py [src] [dst] [factor]
"""
import sys, os, shutil
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1dev"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
con.sql("SET threads TO 16")

def domain_shift(table, col):
    """(max+1) shift constant for `col`'s key domain in src/table."""
    return con.sql(
        f"SELECT max({col}) + 1 FROM '{src}/{table}.parquet'").fetchone()[0]

def replicate(name, key_shifts):
    """Write K key-shifted copies of src/name.parquet to dst.

    key_shifts maps each shifted column to the (table, column) that OWNS
    its key domain — for a foreign key, the PARENT table's key, exactly
    as the lineitem block below derives l_orderkey/l_partkey/l_suppkey
    shifts from orders/part/supplier. Deriving an FK's shift from the
    child's own max would silently misalign replica FKs whenever the top
    parent keys have no child rows (r18 advice: today's fixture happens
    to have max(o_custkey) == max(c_custkey), but that is a coincidence,
    not an invariant)."""
    shifts = {c: domain_shift(tbl, col)
              for c, (tbl, col) in key_shifts.items()}
    con.sql(f"CREATE OR REPLACE VIEW t AS SELECT * FROM '{src}/{name}.parquet'")
    cols = [r[0] for r in con.sql("DESCRIBE t").fetchall()]
    parts = []
    for i in range(K):
        sel = ", ".join(
            f"{c} + {i * shifts[c]} AS {c}" if c in key_shifts
            else c for c in cols)
        parts.append(f"SELECT {sel} FROM t")
    con.sql(f"COPY ({' UNION ALL '.join(parts)}) TO '{dst}/{name}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{dst}/{name}.parquet'").fetchone()[0]
    print(f"{name}: {n} rows")

# dims small enough to just copy (10 nations/5 regions are fixed domains)
for name in ["region", "nation"]:
    shutil.copyfile(f"{src}/{name}.parquet", f"{dst}/{name}.parquet")
    print(f"{name}: copied verbatim")

replicate("customer", {"c_custkey": ("customer", "c_custkey")})
replicate("supplier", {"s_suppkey": ("supplier", "s_suppkey")})
replicate("part", {"p_partkey": ("part", "p_partkey")})
replicate("orders", {"o_orderkey": ("orders", "o_orderkey"),
                     "o_custkey": ("customer", "c_custkey")})
replicate("lineitem", {"l_orderkey": ("orders", "o_orderkey"),
                       "l_partkey": ("part", "p_partkey"),
                       "l_suppkey": ("supplier", "s_suppkey")})

# events: shift event_id and user_id, keep ts/type/value/props
replicate("events", {"event_id": ("events", "event_id"),
                     "user_id": ("events", "user_id")})

# documents: doc_id shift + copy-tagged token churn (copy 0 verbatim)
con.sql(f"CREATE OR REPLACE VIEW t AS SELECT * FROM '{src}/documents.parquet'")
d_shift = con.sql("SELECT max(doc_id) + 1 FROM t").fetchone()[0]
parts = ["SELECT * FROM t"]
for i in range(1, K):
    parts.append(f"""
      SELECT doc_id + {i * d_shift} AS doc_id,
             array_to_string(list_transform(string_split(text, ' '),
               (w, j) -> CASE WHEN (j + {i}) % 5 = 0 THEN 'c{i}' || w ELSE w END),
               ' ') AS text,
             lang, source,
             length(array_to_string(list_transform(string_split(text, ' '),
               (w, j) -> CASE WHEN (j + {i}) % 5 = 0 THEN 'c{i}' || w ELSE w END),
               ' ')) AS n_chars
      FROM t""")
con.sql(f"COPY ({' UNION ALL '.join(parts)}) TO '{dst}/documents.parquet' (FORMAT PARQUET)")
print("documents:", con.sql(f"SELECT count(*) FROM '{dst}/documents.parquet'").fetchone()[0], "rows")

# embeddings: vec_id shift + seeded per-copy noise (copy 0 verbatim)
tbl = pq.read_table(f"{src}/embeddings.parquet")
ids = tbl.column("vec_id").to_numpy()
labels = tbl.column("label").to_numpy()
vecs = np.array(tbl.column("embedding").to_pylist(), dtype=np.float32)
e_shift = int(ids.max()) + 1
std = vecs.std(axis=0)
out_ids, out_vecs, out_labels = [ids], [vecs], [labels]
for i in range(1, K):
    rng = np.random.default_rng(42 + i)
    noisy = vecs + (0.15 * std * rng.standard_normal(vecs.shape)).astype(np.float32)
    out_ids.append(ids + i * e_shift)
    out_vecs.append(noisy)
    out_labels.append(labels)
all_ids = np.concatenate(out_ids)
all_vecs = np.concatenate(out_vecs)
all_labels = np.concatenate(out_labels)
# match the source's list (not fixed-size) physical type
list_arr = pa.array(list(all_vecs), type=pa.list_(pa.float32()))
out = pa.table({"vec_id": pa.array(all_ids, type=pa.int64()),
                "embedding": list_arr,
                "label": pa.array(all_labels, type=pa.int32())})
pq.write_table(out, f"{dst}/embeddings.parquet")
print("embeddings:", len(all_ids), "rows")
print("done ->", dst)
