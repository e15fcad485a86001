"""ANSI-SQL (DuckDB-ready) twins of the hash-dependent pipeline operators.

Each generator emits SQL that replays the corresponding Spark pipeline
*bit-for-bit*: the md5-derived portable hash (:mod:`.hashing`) is identical
in both engines, every seeded constant (MinHash permutation coefficients,
LSH plane indices) is drawn by the same Python code and inlined as literals,
and float-dependent steps either avoid floats entirely (SimHash bit
arithmetic, sparse-plane comparisons) or round before comparing (cosine
rerank).  These strings are this engine's independent correctness oracles —
the driver runs them on DuckDB against the same parquet and diffs values.
"""

from __future__ import annotations

from .dedup import _MERSENNE, minhash_coeffs, simhash_chunk_layout
from .hashing import portable_hash63_sql as _h63

__all__ = [
    "minhash_lsh_oracle_sql",
    "simhash_pairs_oracle_sql",
    "winnow_neardup_oracle_sql",
    "ann_lsh_sparse_oracle_sql",
    "ivf_topk_oracle_sql",
    "semantic_dedup_oracle_sql",
    "bloom_membership_oracle_sql",
]


def _shingle_ctes(table: str, id_col: str, text_col: str, where: str | None, n: int) -> str:
    """tokenize + distinct word n-grams — mirrors ``dedup.word_shingles``."""
    filt = f"WHERE {where}" if where else ""
    shingle = " || ' ' || ".join(f"t[i + {j}]" for j in range(n))
    return rf"""toks AS (
  SELECT {id_col} AS id,
         string_split(regexp_replace(trim(lower({text_col})), '\s+', ' ', 'g'), ' ') AS t
  FROM {table} {filt}
),
sh AS (
  SELECT DISTINCT id, {shingle} AS shingle
  FROM toks, UNNEST(generate_series(1, len(t) - {n - 1})) AS u(i)
  WHERE len(t) >= {n}
)"""


def minhash_lsh_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    where: str | None = None,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    seed: int = 42,
) -> str:
    """Twin of ``minhash_dedup_pairs(..., portable=True)``."""
    rows_per_band = num_hashes // bands
    coeffs = minhash_coeffs(num_hashes, seed)
    mins = ",\n         ".join(
        f"MIN((h * {a} + {b}) % {_MERSENNE}) AS m{i}"
        for i, (a, b) in enumerate(coeffs)
    )
    band_rows = []
    for bidx in range(bands):
        cols = [f"m{bidx * rows_per_band + j}" for j in range(rows_per_band)]
        concat = " || ',' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
        band_rows.append(
            f"SELECT id, {bidx} AS band, {_h63(concat)} AS bucket FROM sig"
        )
    bnd = "\n  UNION ALL ".join(band_rows)
    eq_sum = " + ".join(
        f"(CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END)" for i in range(num_hashes)
    )
    return f"""
WITH {_shingle_ctes(table, id_col, text_col, where, n)},
h AS (
  SELECT id, ({_h63("shingle")}) % {_MERSENNE} AS h FROM sh
),
sig AS (
  SELECT id,
         {mins}
  FROM h GROUP BY id
),
bnd AS (
  {bnd}
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bnd a JOIN bnd b ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
),
est AS (
  SELECT c.id_a, c.id_b,
         ROUND(CAST({eq_sum} AS DOUBLE) / {float(num_hashes)!r}, 6) AS est_jaccard
  FROM cand c
  JOIN sig sa ON sa.id = c.id_a
  JOIN sig sb ON sb.id = c.id_b
)
SELECT id_a, id_b, est_jaccard FROM est WHERE est_jaccard >= {threshold!r}
""".strip()


def simhash_pairs_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    where: str | None = None,
    max_hamming: int = 3,
    n_bits: int = 48,
) -> str:
    """Twin of ``simhash_pairs(..., portable=True, n_bits=n_bits)``."""
    filt = f"WHERE {where}" if where else ""
    bit_sums = ",\n         ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(n_bits)
    )
    fp = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(n_bits)
    )
    layout = simhash_chunk_layout(n_bits, max_hamming)
    chunk_vals = ", ".join(
        f"({c}, {off}, {(1 << w) - 1})" for c, (off, w) in enumerate(layout)
    )
    return rf"""
WITH toks AS (
  SELECT {id_col} AS id,
         unnest(list_filter(string_split_regex(lower(trim({text_col})), '\s+'),
                            x -> x != '')) AS tok
  FROM {table} {filt}
),
h AS (
  SELECT id, {_h63("tok")} AS h FROM toks
),
bits AS (
  SELECT id,
         {bit_sums}
  FROM h GROUP BY id
),
fp AS (
  SELECT id, CAST({fp} AS BIGINT) AS simhash FROM bits
),
chunks AS (
  SELECT id, simhash, ch.c AS c, (simhash >> ch.off) & ch.mask AS v
  FROM fp, (VALUES {chunk_vals}) AS ch(c, off, mask)
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
  FROM chunks a
  JOIN chunks b ON a.c = b.c AND a.v = b.v AND a.id < b.id
)
SELECT id_a, id_b, hamming FROM cand WHERE hamming <= {max_hamming}
""".strip()


def winnow_neardup_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    where: str | None = None,
    k: int = 8,
    w: int = 4,
    min_shared: int = 3,
    df_cap: int | None = None,
) -> str:
    """Twin of ``textops.winnow_neardup_pairs(..., portable=True)``."""
    filt = f"WHERE {where}" if where else ""
    if df_cap is not None:
        cap = (
            f",\nhot AS (SELECT fp FROM fps0 GROUP BY fp HAVING COUNT(*) > {df_cap}),\n"
            "fps AS (SELECT id, fp FROM fps0 WHERE fp NOT IN (SELECT fp FROM hot))"
        )
    else:
        cap = ",\nfps AS (SELECT id, fp FROM fps0)"
    return rf"""
WITH t AS (
  SELECT {id_col} AS id,
         regexp_replace(trim(lower({text_col})), '\s+', ' ', 'g') AS s
  FROM {table} {filt}
),
g AS (
  SELECT id, i AS p, len(s) - {k - 1} AS ng,
         {_h63(f"substr(s, i, {k})")} AS h
  FROM t, UNNEST(generate_series(1, len(s) - {k - 1})) AS u(i)
  WHERE len(s) >= {k}
),
wm AS (
  SELECT id, p, ng,
         MIN(h) OVER (PARTITION BY id ORDER BY p
                      ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS fp
  FROM g
),
fps0 AS (
  SELECT DISTINCT id, fp FROM wm WHERE p <= ng - {w - 1}
){cap}
SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS shared_fps
FROM fps a JOIN fps b ON a.fp = b.fp AND a.id < b.id
GROUP BY 1, 2
HAVING COUNT(*) >= {min_shared}
""".strip()


def ann_lsh_sparse_oracle_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_pred: str = "nid < 5",
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 42,
    dim: int = 64,
) -> str:
    """Twin of ``lsh_topk(..., plane_family='sparse')``.  ``query_pred`` is a
    predicate over the aliased id column ``nid`` selecting the query set
    (which is a subset of the corpus table, as in the driver query)."""
    from .ann import sparse_planes

    sig_cols = []
    for t in range(n_tables):
        planes = sparse_planes(dim, n_planes, seed + 7919 * t)
        bits = " + ".join(
            f"(CASE WHEN {vec_col}[{i + 1}] > {vec_col}[{j + 1}] THEN {1 << b} ELSE 0 END)"
            for b, (i, j) in enumerate(planes)
        )
        sig_cols.append(f"CAST({bits} AS BIGINT) AS s{t}")
    sig_sel = ",\n         ".join(sig_cols)
    cb = "\n  UNION ALL ".join(
        f"SELECT nid, {t} AS t, s{t} AS sig FROM sigc" for t in range(n_tables)
    )
    return f"""
WITH sigc AS (
  SELECT {id_col} AS nid,
         {sig_sel}
  FROM {table}
),
cb AS (
  {cb}
),
qb AS (
  SELECT nid AS qid, t, sig FROM cb WHERE {query_pred}
),
cand AS (
  SELECT DISTINCT q.qid, c.nid
  FROM cb c JOIN qb q ON c.t = q.t AND c.sig = q.sig AND q.qid != c.nid
),
v AS (
  SELECT {id_col} AS vid, list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS e
  FROM {table}
),
u AS (
  SELECT vid, list_transform(e, x -> x / sqrt(list_dot_product(e, e))) AS uv
  FROM v
),
scored AS (
  SELECT cand.qid, cand.nid,
         ROUND(list_dot_product(cu.uv, qu.uv), 6) AS cosine
  FROM cand
  JOIN u cu ON cu.vid = cand.nid
  JOIN u qu ON qu.vid = cand.qid
),
r AS (
  SELECT qid, nid, cosine,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS INT) AS rank
  FROM scored
)
SELECT qid, nid, rank, cosine FROM r WHERE rank <= {k}
""".strip()


def ivf_topk_oracle_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_pred: str = "vec_id < 5",
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
) -> str:
    """Twin of ``ivf_topk(..., portable=True)``.  ``query_pred`` selects the
    query subset of the corpus table by ``{id_col}``."""
    r_hash = _h63(f"CAST(vid AS VARCHAR) || ':{seed}'")
    return f"""
WITH v AS (
  SELECT {id_col} AS vid, list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS e
  FROM {table}
),
u AS (
  SELECT vid, list_transform(e, x -> x / sqrt(list_dot_product(e, e))) AS uv
  FROM v
),
r0 AS (
  SELECT vid, uv, {r_hash} AS r FROM u
),
cent AS (
  SELECT cid, cu FROM (
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY r, vid) AS BIGINT) - 1 AS cid, uv AS cu
    FROM r0
  ) WHERE cid < {n_centroids}
),
ca AS (
  SELECT nid, uv, cid FROM (
    SELECT u.vid AS nid, u.uv AS uv, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY u.vid
             ORDER BY ROUND(list_dot_product(u.uv, c.cu), 6) DESC, c.cid ASC
           ) AS rk
    FROM u CROSS JOIN cent c
  ) WHERE rk = 1
),
qa AS (
  SELECT qid, quv, cid FROM (
    SELECT u.vid AS qid, u.uv AS quv, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY u.vid
             ORDER BY ROUND(list_dot_product(u.uv, c.cu), 6) DESC, c.cid ASC
           ) AS rk
    FROM u CROSS JOIN cent c
    WHERE u.vid IN (SELECT {id_col} FROM {table} WHERE {query_pred})
  ) WHERE rk <= {nprobe}
),
scored AS (
  SELECT DISTINCT qa.qid, ca.nid,
         ROUND(list_dot_product(ca.uv, qa.quv), 6) AS cosine
  FROM ca JOIN qa ON ca.cid = qa.cid AND qa.qid != ca.nid
),
rr AS (
  SELECT qid, nid, cosine,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS INT) AS rank
  FROM scored
)
SELECT qid, nid, rank, cosine FROM rr WHERE rank <= {k}
""".strip()


def semantic_dedup_oracle_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_centroids: int = 16,
    seed: int = 42,
) -> str:
    """Twin of ``semantic_dedup_pairs(..., portable=True)``: replays the
    md5-sampled centroids, the rounded nearest-centroid argmax, and the
    within-cluster pair scoring."""
    r_hash = _h63(f"CAST(vid AS VARCHAR) || ':{seed}'")
    return f"""
WITH v AS (
  SELECT {id_col} AS vid, list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS e
  FROM {table}
),
u AS (
  SELECT vid, list_transform(e, x -> x / sqrt(list_dot_product(e, e))) AS uv
  FROM v
),
r0 AS (
  SELECT vid, uv, {r_hash} AS r FROM u
),
cent AS (
  SELECT cid, cu FROM (
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY r, vid) AS BIGINT) - 1 AS cid, uv AS cu
    FROM r0
  ) WHERE cid < {n_centroids}
),
ca AS (
  SELECT nid, uv, cid FROM (
    SELECT u.vid AS nid, u.uv AS uv, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY u.vid
             ORDER BY ROUND(list_dot_product(u.uv, c.cu), 6) DESC, c.cid ASC
           ) AS rk
    FROM u CROSS JOIN cent c
  ) WHERE rk = 1
)
SELECT a.nid AS id_a, b.nid AS id_b,
       ROUND(list_dot_product(a.uv, b.uv), 6) AS cosine
FROM ca a JOIN ca b ON a.cid = b.cid AND a.nid < b.nid
WHERE ROUND(list_dot_product(a.uv, b.uv), 6) >= {threshold}
""".strip()


def bloom_membership_oracle_sql(
    table: str,
    col_expr: str,
    probes: list[str],
    m: int = 4096,
    k: int = 3,
) -> str:
    """Twin of ``bloom_contains_df(..., portable=True)`` over string items."""
    idx = ", ".join(f"({i})" for i in range(k))
    probe_vals = ", ".join("('" + p.replace("'", "''") + "')" for p in probes)
    salted = "s || '#1'"
    h1 = f"({_h63('s')}) % {m}"
    h2 = f"({_h63(salted)}) % {m - 1} + 1"
    return f"""
WITH items AS (
  SELECT CAST({col_expr} AS VARCHAR) AS s FROM {table}
),
ih AS (
  SELECT {h1} AS h1, {h2} AS h2 FROM items
),
bits AS (
  SELECT DISTINCT (h1 + i * h2) % {m} AS bit
  FROM ih CROSS JOIN (VALUES {idx}) AS t(i)
),
probes AS (
  SELECT v FROM (VALUES {probe_vals}) AS p(v)
),
ph AS (
  SELECT v, {h1} AS h1, {h2} AS h2
  FROM (SELECT v, v AS s FROM probes)
),
pb AS (
  SELECT v, (h1 + i * h2) % {m} AS bit
  FROM ph CROSS JOIN (VALUES {idx}) AS t(i)
)
SELECT v,
       (COUNT(*) FILTER (WHERE bit IN (SELECT bit FROM bits)) = {k}) AS might_contain
FROM pb GROUP BY v
""".strip()
