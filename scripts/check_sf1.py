#!/usr/bin/env python3
"""sf1 leg of the correctness gate (run by scripts/sf1_verify.sh).

126 of the 129 queries compare exactly against their DuckDB oracles
(check_oracle.main with a skip set). The remaining three verify by the
r14-established sf1 criteria:

- pack_sequences: the recursive-CTE oracle is row-by-row recursion
  (~62k steps per shard — quadratic in DuckDB, still running after
  20 min at sf1). The ENGINE output is instead checked against the
  complete next-fit invariant set in non-recursive SQL: every doc
  packed exactly once, shard = id % 8, no multi-doc sequence over the
  256-token budget, positions contiguous in pack order, seq_no gapless,
  and no premature opens (every new sequence's first doc would overflow
  the previous sequence). Together these determine the next-fit output
  uniquely, so invariants => equality.

- dedup_embedding_lsh / dedup_embedding_incremental: the LSH pass is
  DESIGNED to a sub-1% per-pair miss bound at the 0.45 threshold
  (SCALE.md "Full oracle suite at sf1"); at sf1's near-threshold pair
  mass some misses are expected (r14: 91/16442 and 12/2873, with
  theory predicting 94.7). Checked: zero EXTRA pairs (precision stays
  exact), miss rate <= 1%, and every missed pair within 0.1 of the
  threshold (i.e. cosine < 0.55 — a real recall bug would lose
  high-cosine pairs).

Usage: python3 scripts/check_sf1.py <sf1Dir> <verifyOutDir>
"""
import json
import sys

import duckdb

import check_oracle

SKIP = frozenset(
    ["pack_sequences", "dedup_embedding_lsh", "dedup_embedding_incremental"])

PACK_BUDGET = 256
LSH_THRESHOLD = 0.45
LSH_MAX_MISS_RATE = 0.01
LSH_MISS_COSINE_SLACK = 0.10


def check_pack_sequences(con, out_dir):
    con.sql(f"CREATE VIEW r AS SELECT * FROM '{out_dir}/pack_sequences/*.parquet'")
    con.sql(r"""CREATE VIEW tk AS SELECT doc_id,
      len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS tk
      FROM documents""")
    fails = []

    def inv(label, sql, want):
        got = con.sql(sql).fetchall()
        okay = got == want
        print(f"{'OK  ' if okay else 'FAIL'} pack_sequences invariant: {label} -> {got}")
        if not okay:
            fails.append(label)

    n_docs = con.sql("SELECT count(*) FROM documents").fetchone()[0]
    inv("coverage+shard (count, distinct, shard=id%8)",
        "SELECT count(*), count(DISTINCT id), bool_and(shard = id % 8) FROM r",
        [(n_docs, n_docs, True)])
    # oversize single docs legitimately exceed the budget; multi-doc never
    inv("budget violations (multi-doc sequences over budget)",
        f"""SELECT count(*) FROM (
          SELECT r.shard, r.seq_no FROM r JOIN tk ON r.id = tk.doc_id
          GROUP BY 1,2 HAVING sum(tk.tk) > {PACK_BUDGET} AND count(*) > 1)""",
        [(0,)])
    inv("position violations (seq_pos contiguous in doc-id order)",
        """SELECT count(*) FROM (
          SELECT *, row_number() OVER (PARTITION BY shard, seq_no ORDER BY id) - 1 AS want
          FROM r) WHERE seq_pos <> want""",
        [(0,)])
    inv("seq_no gaps (non-decreasing, steps of <=1, per shard)",
        """SELECT count(*) FROM (
          SELECT seq_no, lag(seq_no) OVER (PARTITION BY shard ORDER BY id) AS prev
          FROM r) WHERE prev IS NOT NULL AND (seq_no < prev OR seq_no > prev + 1)""",
        [(0,)])
    inv("premature opens (new sequence while previous still fits)",
        f"""WITH j AS (SELECT r.id, r.shard, r.seq_no, tk.tk
               FROM r JOIN tk ON r.id = tk.doc_id),
          sums AS (SELECT shard, seq_no, sum(tk) s FROM j GROUP BY 1,2),
          opens AS (
            SELECT j.shard, j.seq_no, j.tk FROM j
            WHERE j.seq_no > 0 AND j.id = (SELECT min(id) FROM j j2
              WHERE j2.shard = j.shard AND j2.seq_no = j.seq_no))
          SELECT count(*) FROM opens o
          JOIN sums p ON p.shard = o.shard AND p.seq_no = o.seq_no - 1
          WHERE p.s + o.tk <= {PACK_BUDGET}""",
        [(0,)])
    return len(fails)


def check_lsh_recall(con, out_dir, name, oracle_sql):
    got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
    exp = con.sql(oracle_sql).df()
    id_cols = [c for c in exp.columns if c.startswith("id")]
    kg = set(map(tuple, got[id_cols].values))
    ke = set(map(tuple, exp[id_cols].values))
    missing, extra = ke - kg, kg - ke
    rate = len(missing) / max(len(ke), 1)
    worst = 0.0
    if missing:
        # the oracles emit only id pairs — compute each missed pair's
        # true cosine from the source table (a high-cosine miss would be
        # a real recall bug, not the designed near-threshold loss)
        vals = ",".join(f"({int(a)},{int(b)})" for a, b in missing)
        worst = float(con.sql(f"""
          SELECT max(list_cosine_similarity(ea.embedding, eb.embedding))
          FROM (VALUES {vals}) m(ia, ib)
          JOIN embeddings ea ON ea.vec_id = m.ia
          JOIN embeddings eb ON eb.vec_id = m.ib""").fetchone()[0])
    okay = (not extra and rate <= LSH_MAX_MISS_RATE
            and worst < LSH_THRESHOLD + LSH_MISS_COSINE_SLACK)
    print(f"{'OK  ' if okay else 'FAIL'} {name}: missed {len(missing)}/{len(ke)} "
          f"({100 * rate:.2f}%, bound {100 * LSH_MAX_MISS_RATE:.0f}%), extra {len(extra)}, "
          f"worst missed cosine {worst:.4f} (bound {LSH_THRESHOLD + LSH_MISS_COSINE_SLACK})")
    return 0 if okay else 1


def main(sf_dir, out_dir):
    fail = check_oracle.main(sf_dir, out_dir, SKIP)  # failure count
    con = duckdb.connect()
    for t in check_oracle.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    fail += check_pack_sequences(con, out_dir)
    for name in ["dedup_embedding_lsh", "dedup_embedding_incremental"]:
        fail += check_lsh_recall(con, out_dir, name, oracles[name])
    print("\nsf1 gate:", "GREEN" if fail == 0 else f"{fail} FAILURES")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
