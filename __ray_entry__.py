"""Driver contract for the graft builder (Ray Data target).

The driver calls ``entry()`` as a smoke check (Ray already initialised),
runs each ``queries()[name](sf_dir)`` at sf=0.01 and compares against
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). Nothing here calls ray.init()/ray.shutdown().

Transcript-graph queries run over the deterministic synthetic transcripts
fixture for the scale (pregel_ray.fixtures — BASELINE.json input_hint
schema); the oracle SQL reads the very same parquet via read_parquet().
Column names match between Ray results and SQL exactly.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_ORACLE = "/root/testdata/sf0.01"  # the scale the driver compares at

# ---------------------------------------------------------------------------
# shared SQL fragments (over the synthetic transcripts fixture)
# ---------------------------------------------------------------------------


def _transcripts_sql_path() -> str:
    from pregel_ray.fixtures import transcripts_path

    return transcripts_path(SF_ORACLE)


def _edges_cte() -> str:
    # MATERIALIZED: every downstream CTE references these repeatedly; without
    # it DuckDB inlines the whole chain per reference (exponential for the
    # unrolled PageRank, "too many open files" on the parquet source).
    return f"""
  t AS MATERIALIZED (SELECT * FROM read_parquet('{_transcripts_sql_path()}')),
  named AS MATERIALIZED (SELECT conv_id, turn_idx,
                   COALESCE(tool, conv_id || '/' || role) AS name FROM t),
  pairs AS MATERIALIZED (SELECT name AS src_name,
                   LEAD(name) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS dst_name
            FROM named),
  e AS MATERIALIZED (SELECT src_name, dst_name, CAST(COUNT(*) AS DOUBLE) AS w
        FROM pairs WHERE dst_name IS NOT NULL GROUP BY src_name, dst_name)
"""


def _graph_cte() -> str:
    return (
        _edges_cte()
        + """,
  v AS MATERIALIZED (SELECT DISTINCT name FROM
        (SELECT src_name AS name FROM e UNION ALL SELECT dst_name FROM e)),
  nv AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v),
  en AS MATERIALIZED (SELECT src_name, dst_name,
                      w / SUM(w) OVER (PARTITION BY src_name) AS p FROM e),
  dangling AS MATERIALIZED (SELECT name FROM v
               WHERE name NOT IN (SELECT DISTINCT src_name FROM e))
"""
    )


def _pagerank_sql(iters: int) -> str:
    """Unrolled power iteration (DuckDB recursive CTEs cannot aggregate in
    the recursive term) — semantics identical to algorithms/pagerank.py."""
    ctes = ["pr0 AS MATERIALIZED (SELECT v.name, 1.0/nv.n AS rank FROM v CROSS JOIN nv)"]
    for k in range(1, iters + 1):
        prev = f"pr{k - 1}"
        ctes.append(f"""
  pr{k} AS MATERIALIZED (
    SELECT v.name,
           (1-0.85)/nv.n + 0.85*(COALESCE(r.recv, 0) + dm.dm/nv.n) AS rank
    FROM v CROSS JOIN nv
    CROSS JOIN (SELECT COALESCE(SUM(p.rank),0) AS dm
                FROM {prev} p JOIN dangling d ON p.name = d.name) dm
    LEFT JOIN (SELECT en.dst_name AS nm, SUM(p.rank * en.p) AS recv
               FROM en JOIN {prev} p ON p.name = en.src_name
               GROUP BY en.dst_name) r ON r.nm = v.name)""")
    return (
        "WITH " + _graph_cte() + ", " + ",".join(ctes)
        + f"\nSELECT name, ROUND(rank, 6) AS rank FROM pr{iters}"
    )


def _sssp_sql(iters: int = 10, source: str = "tool-00") -> str:
    """Unrolled Bellman-Ford rounds (one round = one BSP superstep of
    algorithms/sssp.py); distances are integer-count sums → exact doubles."""
    ctes = [f"d0 AS MATERIALIZED (SELECT '{source}' AS name, 0.0 AS dist)"]
    for k in range(1, iters + 1):
        prev = f"d{k - 1}"
        ctes.append(f"""
  d{k} AS MATERIALIZED (
    SELECT name, MIN(dist) AS dist FROM (
      SELECT name, dist FROM {prev}
      UNION ALL
      SELECT e.dst_name AS name, p.dist + e.w AS dist
      FROM {prev} p JOIN e ON e.src_name = p.name
    ) GROUP BY name)""")
    return (
        "WITH " + _edges_cte() + ", " + ",".join(ctes)
        + f"\nSELECT name, dist FROM d{iters}"
    )


def _cc_sql() -> str:
    """Connected components of the transcript graph, exactly.

    Structural fact of the derived graph (FIXTURES.md §1): every
    conversation's turn chain connects ALL of that conversation's vertices
    (its conv/role vertices and the tools it uses) into one blob, so global
    components = conversation blobs merged through shared tools. The
    tool-tool co-occurrence graph has ≤32 nodes → its transitive closure is
    a cheap recursive CTE; conv blobs inherit their tools' component, and
    tool-less conversations are singleton components. Labels are canonical:
    MIN member name per component (matching pipelines.cc_labels)."""
    return (
        "WITH RECURSIVE "
        + _edges_cte()
        + """,
  v AS MATERIALIZED (SELECT DISTINCT name FROM
        (SELECT src_name AS name FROM e UNION ALL SELECT dst_name FROM e)),
  conv_tools AS MATERIALIZED (
      SELECT DISTINCT conv_id, tool FROM t WHERE tool IS NOT NULL
        AND conv_id IN (SELECT split_part(name, '/', 1) FROM v WHERE contains(name, '/'))
  ),
  tool_edges AS MATERIALIZED (
      SELECT DISTINCT a.tool AS ta, b.tool AS tb
      FROM conv_tools a JOIN conv_tools b USING (conv_id)),
  reach AS (
      SELECT tool AS tool, tool AS root FROM (SELECT DISTINCT tool FROM conv_tools)
      UNION
      SELECT e.tb, r.root FROM reach r JOIN tool_edges e ON e.ta = r.tool),
  tool_comp AS MATERIALIZED (SELECT tool, MIN(root) AS ck FROM reach GROUP BY tool),
  conv_comp AS MATERIALIZED (
      SELECT ct.conv_id, MIN(tc.ck) AS ck
      FROM conv_tools ct JOIN tool_comp tc ON tc.tool = ct.tool
      GROUP BY ct.conv_id),
  keyed AS MATERIALIZED (
      SELECT v.name,
             CASE WHEN NOT contains(v.name, '/') THEN
                      (SELECT ck FROM tool_comp WHERE tool = v.name)
                  ELSE COALESCE(
                      (SELECT ck FROM conv_comp
                       WHERE conv_id = split_part(v.name, '/', 1)),
                      'solo:' || split_part(v.name, '/', 1))
             END AS ck
      FROM v)
  SELECT name, MIN(name) OVER (PARTITION BY ck) AS component FROM keyed
"""
    )


def _triangles_cte() -> str:
    return (
        "WITH "
        + _edges_cte()
        + """,
  simple AS (SELECT DISTINCT LEAST(src_name, dst_name) AS a,
                             GREATEST(src_name, dst_name) AS b
             FROM e WHERE src_name <> dst_name),
  tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM simple e1
          JOIN simple e2 ON e2.a = e1.b
          JOIN simple e3 ON e3.a = e1.a AND e3.b = e2.b)
"""
    )


# ---------------------------------------------------------------------------


def entry() -> Any:
    """Flagship: sf0.001 transcripts → edge graph → converged PageRank →
    named per-vertex ranks (top-ranked = the Zipf tool hubs)."""
    from pregel_ray.pipelines import pagerank_converged

    _, named = pagerank_converged("/root/testdata/sf0.001")
    return named


def queries() -> dict[str, Callable[[str], Any]]:
    from pregel_ray import pipelines as P

    def _docs(sf_dir):
        import ray.data as rd

        return rd.read_parquet(f"{sf_dir}/documents.parquet")

    def _emb(sf_dir):
        import ray.data as rd

        return rd.read_parquet(f"{sf_dir}/embeddings.parquet")

    def ann_topk(sf_dir):
        import numpy as np

        from pregel_ray.ops.ann import brute_topk

        emb = _emb(sf_dir)
        q = emb.filter(lambda r: r["vec_id"] < 5).to_pandas()
        queries_m = np.stack(q["embedding"].to_numpy()).astype(np.float64)
        return brute_topk(emb, queries_m, q["vec_id"].to_numpy(), k=10)

    def ann_ivf(sf_dir):
        import numpy as np

        from pregel_ray.ops.ann import ivf_topk

        emb = _emb(sf_dir)
        q = emb.filter(lambda r: r["vec_id"] < 5).to_pandas()
        queries_m = np.stack(q["embedding"].to_numpy()).astype(np.float64)
        return ivf_topk(emb, queries_m, q["vec_id"].to_numpy(), k=10)

    def neardup(sf_dir):
        # 0.35: the synthetic embeddings top out at cos≈0.51 — this exercises
        # the op with a non-trivial result set (the 0.95-near-dup variant is
        # covered with planted duplicates in tests/test_ops.py)
        from pregel_ray.ops.ann import neardup_exact

        return neardup_exact(_emb(sf_dir), threshold=0.35)

    def minhash(sf_dir):
        from pregel_ray.ops.dedup import minhash_lsh_candidates, ngram_jaccard_verify

        docs = _docs(sf_dir)
        cand = minhash_lsh_candidates(docs, num_perm=64, bands=16)
        return ngram_jaccard_verify(docs, cand, threshold=0.8)

    def simhash(sf_dir):
        from pregel_ray.ops.dedup import simhash_near_dups

        return simhash_near_dups(_docs(sf_dir), max_hamming=3)

    def media(sf_dir):
        import ray.data as rd

        from pregel_ray.ops.multimodal import media_features, synth_media

        n = 256 if "0.01" in sf_dir else 64
        return media_features(rd.from_arrow(synth_media(n))).drop_columns(["feature"])

    from pregel_ray.ops import relational as R
    from pregel_ray.ops.dedup import exact_duplicates
    from pregel_ray.ops.text import langid, lexical_stats, quality_scores, token_counts

    return {
        # -- transcript link graph (SURVEY.md §2 / north rule core) --------
        "edges_materialize": lambda sf: P.edges_named(sf),
        "vertex_out_degrees": lambda sf: P.vertex_out_degrees(sf),
        "pagerank_fixed20": lambda sf: P.pagerank_fixed(sf, 20),
        "pagerank_top20": lambda sf: P.pagerank_top20(sf),
        "cc_labels": lambda sf: P.cc_labels(sf),
        "cc_sizes": lambda sf: P.cc_sizes(sf),
        "lpa_clusters": lambda sf: P.lpa_labels(sf),
        "triangles_per_vertex": lambda sf: P.triangles_per_vertex(sf),
        "triangle_total": lambda sf: P.triangle_total_table(sf),
        "sssp_from_hub": lambda sf: P.sssp_from_hub(sf),
        # -- training-data ops over documents/embeddings -------------------
        "doc_token_counts": lambda sf: token_counts(_docs(sf)),
        "doc_lexical_stats": lambda sf: lexical_stats(_docs(sf)),
        "dedup_exact_groups": lambda sf: exact_duplicates(_docs(sf)),
        "doc_langid": lambda sf: langid(_docs(sf)),
        "doc_quality": lambda sf: quality_scores(_docs(sf)),
        "dedup_minhash_verified": minhash,
        "dedup_simhash_pairs": simhash,
        "ann_brute_topk": ann_topk,
        "ann_ivf_topk": ann_ivf,
        "embedding_neardup": neardup,
        "multimodal_features": media,
        # -- relational surface (sources/sinks, joins, windows) ------------
        "q1_pricing_summary": lambda sf: R.q1_pricing_summary(sf),
        "top_orders_with_customer": lambda sf: R.top_orders_with_customer(sf),
        "events_hourly": lambda sf: R.events_hourly(sf),
        "supplier_nation_rollup": lambda sf: R.supplier_nation_rollup(sf),
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB equivalents (views pre-registered for the sf tables; the
    transcripts fixture is addressed by absolute parquet path). Queries
    without an entry here are checked rows-only by the driver:
    pagerank_top20 (convergence is data-dependent; the fixed-iteration
    variant is value-checked), lpa (tie-breaking orders by internal vid —
    no name-order SQL equivalent), LSH/minhash/simhash/IVF (approximate by
    design; exactness covered by planted-duplicate tests and the exact
    neardup/brute-topk oracles), langid/quality/multimodal (model-style
    scoring, pytest-validated)."""
    e = "WITH " + _edges_cte()
    return {
        "edges_materialize": e + "SELECT src_name, dst_name, w FROM e",
        "vertex_out_degrees": e + """
            SELECT src_name AS name, COUNT(*) AS out_deg, SUM(w) AS out_w
            FROM e GROUP BY src_name""",
        "pagerank_fixed20": _pagerank_sql(20),
        "sssp_from_hub": _sssp_sql(10),
        "cc_labels": _cc_sql(),
        "cc_sizes": (
            "SELECT component, COUNT(*) AS size FROM (" + _cc_sql() + ") GROUP BY component"
        ),
        "triangles_per_vertex": _triangles_cte() + """
            SELECT name, COUNT(*) AS triangles FROM (
              SELECT x AS name FROM tri
              UNION ALL SELECT y FROM tri
              UNION ALL SELECT z FROM tri) GROUP BY name""",
        "triangle_total": _triangles_cte() + "SELECT COUNT(*) AS total FROM tri",
        "doc_token_counts": """
            SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
            FROM documents""",
        "doc_lexical_stats": """
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_tokens,
                   len(list_distinct(string_split(text, ' '))) AS n_distinct,
                   (len(list_distinct(string_split(text, ' '))) * 1000000)
                     // len(string_split(text, ' ')) AS ttr_ppm
            FROM documents""",
        "dedup_exact_groups": """
            SELECT md5(text) AS fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
            FROM documents GROUP BY md5(text)""",
        "ann_brute_topk": """
            WITH q AS (SELECT vec_id AS query_id,
                              CAST(embedding AS DOUBLE[]) AS qe
                       FROM embeddings WHERE vec_id < 5),
            sims AS (SELECT q.query_id, e.vec_id,
                            ROUND(list_cosine_similarity(q.qe,
                                  CAST(e.embedding AS DOUBLE[])), 6) AS cos
                     FROM q CROSS JOIN embeddings e),
            ranked AS (SELECT query_id, vec_id, cos,
                              ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, vec_id) AS rank
                       FROM sims)
            SELECT query_id, vec_id, cos, rank FROM ranked WHERE rank <= 10""",
        "embedding_neardup": """
            SELECT a.vec_id AS a, b.vec_id AS b,
                   ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                         CAST(b.embedding AS DOUBLE[])), 6) AS cos
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                  CAST(b.embedding AS DOUBLE[])) >= 0.35""",
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(ROUND(SUM(l_quantity) * 100) AS BIGINT) AS sum_qty_c100,
                   CAST(ROUND(SUM(l_extendedprice) * 100) AS BIGINT) AS sum_base_price_c100,
                   CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT)
                       AS sum_disc_price_c10k,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus""",
        "top_orders_with_customer": """
            SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, c.c_name
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
            ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 10""",
        "events_hourly": """
            SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n,
                   CAST(ROUND(SUM(value) * 100) AS BIGINT) AS value_sum_c100
            FROM events GROUP BY event_type, date_trunc('hour', ts)""",
        "supplier_nation_rollup": """
            SELECT r.r_name, n.n_name, COUNT(*) AS n_suppliers
            FROM supplier s
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            GROUP BY r.r_name, n.n_name""",
    }
