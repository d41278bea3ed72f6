"""Link-graph operators (SURVEY.md §2.C) — the domain-authority side of
web-corpus curation.

A pretraining crawl pipeline ranks domains by link authority (OPIC /
PageRank over the host graph) to prioritize fetch order and to weight
quality scores; the graph is huge (edges ~ pages) but the RANK state is
small (nodes ~ hosts), so the scalable shape is: one heavy edge
extraction + aggregation pass from the document corpus down to the
host-level weighted edge list, then cheap iterations over the bounded
node set. ``kmeans_iterate`` (similarity.py) established the repo's
pattern for deterministic fixed-iteration algorithms; this module
applies it to graph power iteration with pure bigint arithmetic so the
DuckDB oracle matches bit-for-bit (no libm, no FP accumulation order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oil_wells_data_wrangling_spark.plans.registry import register
from oil_wells_data_wrangling_spark.sources.readers import load_tables

# Rank fixed-point scale and damping (85/100) — integers only.
_PR_SCALE = 1_000_000
_PR_BASE = _PR_SCALE * 15 // 100  # (1 - d) * SCALE

_PAGERANK_ORACLE = f"""
WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
edges_raw AS (
  SELECT d1.source AS src, d2.source AS dst
  FROM documents d1 CROSS JOIN n
  JOIN documents d2 ON d2.doc_id = (d1.doc_id * 31 + 7) % n.n
),
edges AS (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w
  FROM edges_raw GROUP BY src, dst
),
outw AS (
  SELECT src, CAST(SUM(w) AS BIGINT) AS out_w FROM edges GROUP BY src
),
nodes AS (
  SELECT DISTINCT source AS node FROM documents
),
r0 AS (
  SELECT node, CAST({_PR_SCALE} AS BIGINT) AS r FROM nodes
),
r1 AS (
  SELECT nodes.node,
         CAST({_PR_BASE} + COALESCE(SUM(
           (r0.r * e.w * 85) // (o.out_w * 100)), 0) AS BIGINT) AS r
  FROM nodes
  LEFT JOIN edges e ON e.dst = nodes.node
  LEFT JOIN outw o ON o.src = e.src
  LEFT JOIN r0 ON r0.node = e.src
  GROUP BY nodes.node
),
r2 AS (
  SELECT nodes.node,
         CAST({_PR_BASE} + COALESCE(SUM(
           (r1.r * e.w * 85) // (o.out_w * 100)), 0) AS BIGINT) AS r
  FROM nodes
  LEFT JOIN edges e ON e.dst = nodes.node
  LEFT JOIN outw o ON o.src = e.src
  LEFT JOIN r1 ON r1.node = e.src
  GROUP BY nodes.node
),
r3 AS (
  SELECT nodes.node,
         CAST({_PR_BASE} + COALESCE(SUM(
           (r2.r * e.w * 85) // (o.out_w * 100)), 0) AS BIGINT) AS r
  FROM nodes
  LEFT JOIN edges e ON e.dst = nodes.node
  LEFT JOIN outw o ON o.src = e.src
  LEFT JOIN r2 ON r2.node = e.src
  GROUP BY nodes.node
)
SELECT r3.node AS source, r3.r AS rank_fp,
       COALESCE(deg.in_edges, 0) AS in_edges
FROM r3
LEFT JOIN (
  SELECT dst, CAST(COUNT(*) AS BIGINT) AS in_edges FROM edges GROUP BY dst
) deg ON deg.dst = r3.node
"""


def _pr_iteration(nodes: DataFrame, ew: DataFrame, ranks: DataFrame) -> DataFrame:
    """One damped power-iteration step over the bounded node set.

    ``ew`` carries (src, dst, w, out_w); contributions floor-divide in
    bigint exactly as the oracle's ``//`` so engines cannot drift."""
    contrib = (
        ew.join(ranks.withColumnRenamed("node", "src"), "src")
        .select(
            F.col("dst").alias("node"),
            F.expr(f"(r * w * 85) div (out_w * 100)").alias("c"),
        )
        .groupBy("node")
        .agg(F.sum("c").alias("c"))
    )
    return nodes.join(contrib, "node", "left").select(
        "node",
        (F.lit(_PR_BASE) + F.coalesce(F.col("c"), F.lit(0)))
        .cast("bigint")
        .alias("r"),
    )


@register("domain_pagerank", oracle=_PAGERANK_ORACLE, headline=True)
def domain_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank (3 power iterations, d=0.85) over the domain link
    graph — the crawl-prioritization / quality-weighting authority score
    of a web-corpus pipeline. The per-document outlink is synthesized
    deterministically (doc ``i`` cites the domain of doc ``(31i+7) mod
    N``) standing in for a real href extraction; the production form
    replaces only the ``edges_raw`` stage with the link parser —
    :func:`link_graph_pagerank` below IS that form (real
    ``regexp_extract_all`` href parsing, no document-to-document
    join), kept alongside so both edge-stage shapes stay measured.

    Scale shape: the ONE corpus-sized pass reduces documents to the
    weighted domain-level edge list ((src, dst, w) — a partial-agg
    shuffle on the edge key); out-weights and all three iterations then
    run on the bounded node/edge tables, each a broadcast-joinable
    aggregate whose exchanges carry (node, bigint) pairs only. Rank
    arithmetic is fixed-point bigint with floor division — identical in
    both engines, no FP accumulation order to drift. A real host graph
    (~1e8 nodes) still fits the same plan: the iterations shuffle rank
    state proportional to NODES, never to documents, and the damping
    base re-injects mass for dangling/unlinked hosts via the left join
    + coalesce."""
    t = load_tables(spark, sf_dir)
    docs = t.documents.select("doc_id", "source")
    # 1-row scalar collected once and inlined as a literal (the
    # rrf_fusion precedent) — drops the BroadcastNestedLoopJoin Cross
    # and its count subtree from the corpus-sized stage.
    n_val = docs.count()
    # Edge extraction: the heavy, corpus-sized stage — run ONCE.
    targets = docs.select(
        F.col("source").alias("src"),
        ((F.col("doc_id") * 31 + 7) % F.lit(n_val)).alias("t_id"),
    )
    edges = (
        targets.join(
            docs.select(F.col("doc_id").alias("t_id"), F.col("source").alias("dst")),
            "t_id",
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    # ew and nodes are HOST-bounded; materialize them so the plan for
    # every iteration (and the in-degree audit) starts from the tiny
    # table instead of re-embedding the corpus-sized extraction
    # subtree. Without this the final AQE plan re-ran the document
    # scan 7x / the edge aggregation 2x (r15 plan audit: only 2 of 8
    # shuffle stages were reused) — at 100 TB each un-reused copy is a
    # full corpus pass.
    ew = edges.join(outw, "src").localCheckpoint(eager=True)
    nodes = (
        docs.select(F.col("source").alias("node"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    ranks = nodes.select("node", F.lit(_PR_SCALE).cast("bigint").alias("r"))
    for _ in range(3):
        ranks = _pr_iteration(nodes, ew, ranks)

    # ew is one row per (src, dst), so the in-degree count over it is
    # identical to counting the pre-outw edge list.
    indeg = ew.groupBy("dst").agg(F.count(F.lit(1)).alias("in_edges"))
    return (
        ranks.join(indeg, ranks.node == indeg.dst, "left")
        .select(
            F.col("node").alias("source"),
            F.col("r").alias("rank_fp"),
            F.coalesce("in_edges", F.lit(0)).alias("in_edges"),
        )
    )


# -------------------------------------------------------------- triangle_count

_TRIANGLE_ORACLE = """
WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
raw AS (
  SELECT d1.source AS a, d2.source AS b
  FROM documents d1 CROSS JOIN n
  JOIN documents d2 ON d2.doc_id =
    (CAST('0x' || substr(md5('lnk' || d1.doc_id), 1, 8) AS BIGINT)
     % 2147483647) % n.n
),
und AS (
  SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
  FROM raw WHERE a <> b
),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
  FROM (SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und) e
  GROUP BY node
),
ori AS (
  SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
              THEN u.a ELSE u.b END AS src,
         CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
              THEN u.b ELSE u.a END AS dst
  FROM und u
  JOIN deg da ON da.node = u.a
  JOIN deg db ON db.node = u.b
),
tri AS (
  SELECT e1.src AS pvt
  FROM ori e1
  JOIN ori e2 ON e2.src = e1.src AND e2.dst > e1.dst
  JOIN und c ON c.a = least(e1.dst, e2.dst) AND c.b = greatest(e1.dst, e2.dst)
)
SELECT deg.node AS source, deg.deg,
       COALESCE(t.tri_pivot, 0) AS tri_pivot
FROM deg
LEFT JOIN (
  SELECT pvt, CAST(COUNT(*) AS BIGINT) AS tri_pivot FROM tri GROUP BY pvt
) t ON t.pvt = deg.node
"""


@register("triangle_count", oracle=_TRIANGLE_ORACLE)
def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the undirected domain link graph — the
    clustering-coefficient / community-density signal a crawl pipeline
    uses to separate organic link neighborhoods from link farms (spam
    hosts form near-cliques; quality hosts don't). Same extraction
    PIPELINE as ``domain_pagerank`` (one corpus-sized pass down to the
    host edge list) but an md5-derived pseudorandom outlink (doc i
    cites the domain of doc h32('lnk'||i) mod N): pagerank's affine
    (31i+7) map collapses to an affine map modulo the host count,
    whose functional graph provably contains no triangles — a real
    href extractor replaces only this one stage.

    Scale shape: the classic degree-orientation rewrite — every
    undirected edge is oriented from its LOWER-degree endpoint (ties
    broken lexicographically), so each triangle is generated exactly
    once as a wedge at its minimum-degree vertex and the wedge
    self-join's fan-out is bounded by the graph's arboricity (max
    out-degree ~ sqrt(|E|)), not by the max raw degree — the
    difference between a tractable and a quadratic plan on power-law
    host graphs. The corpus-sized work is the one edge-extraction
    pass; und/deg/ori are node-bounded, the wedge join shuffles on
    ``src`` only, and the closing-edge probe joins the canonical
    (a < b) edge table — no OR-join, no direction ambiguity. Per-node
    output is the pivot count (triangles closed at that vertex);
    the global triangle count is its sum."""
    t = load_tables(spark, sf_dir)
    docs = t.documents.select("doc_id", "source")
    # corpus count collected once and inlined (the r15 domain_pagerank
    # pattern, r16): crossJoin(broadcast(1-row count)) compiled to a
    # BroadcastNestedLoopJoin Cross over every document row in the
    # edge-extraction stage — a row-copy operator between the scan and
    # the t_id join for a single scalar. Construction gains one
    # column-pruned count job; the modulus value is identical.
    n = docs.count()
    raw = (
        docs.select(
            F.col("source").alias("a"),
            (
                F.expr(
                    "cast(conv(substr(md5(concat('lnk', doc_id)), 1, 8),"
                    " 16, 10) as bigint) % 2147483647"
                )
                % F.lit(n)
            ).alias("t_id"),
        )
        .join(
            docs.select(F.col("doc_id").alias("t_id"), F.col("source").alias("b")),
            "t_id",
        )
    )
    und = (
        raw.filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
    )
    # und is node^2-BOUNDED but corpus-PRICED: deg (twice, via the
    # union), ori, and the closing-edge probe all reference it, and
    # without a persist each reference re-runs the corpus-sized
    # extraction — the cache turns ~5 corpus scans into 1.
    und = und.persist()
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))
    low_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    ori = (
        und.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .select(
            F.when(low_first, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(low_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        )
    )
    e1 = ori.select("src", F.col("dst").alias("v"))
    e2 = ori.select("src", F.col("dst").alias("w"))
    wedges = e1.join(e2, "src").filter(F.col("w") > F.col("v"))
    tri = wedges.join(
        und,
        (F.col("a") == F.least("v", "w")) & (F.col("b") == F.greatest("v", "w")),
    ).select(F.col("src").alias("pivot"))
    piv = tri.groupBy("pivot").agg(F.count(F.lit(1)).cast("bigint").alias("tri_pivot"))
    return (
        deg.join(piv, deg.node == piv.pivot, "left")
        .select(
            F.col("node").alias("source"),
            "deg",
            F.coalesce("tri_pivot", F.lit(0).cast("bigint")).alias("tri_pivot"),
        )
    )


# -------------------------------------------------------- link_graph_pagerank

_LG_PAGE_SPARK = (
    "concat('<html><body><div class=\"nav\"><a href=\"/home\">home</a></div>',"
    " '<a href=\"https://site', cast(doc_id % 20 as string),"
    " '.example.com/self\">self</a>',"
    " '<a href=\"https://site', cast((doc_id * 31 + 7) % 20 as string),"
    " '.example.com/p', cast(doc_id as string), '\">out1</a>',"
    " case when doc_id % 2 = 0 then concat('<a href=\"https://site',"
    " cast(doc_id % 4 as string), '.example.com/q\">out2</a>')"
    " else '' end,"
    " '<p>', text, '</p></body></html>')"
)

_LG_PAGE_DUCK = """
    '<html><body><div class="nav"><a href="/home">home</a></div>'
    || '<a href="https://site' || CAST(doc_id % 20 AS VARCHAR)
    || '.example.com/self">self</a>'
    || '<a href="https://site' || CAST((doc_id * 31 + 7) % 20 AS VARCHAR)
    || '.example.com/p' || CAST(doc_id AS VARCHAR) || '">out1</a>'
    || CASE WHEN doc_id % 2 = 0 THEN '<a href="https://site'
         || CAST(doc_id % 4 AS VARCHAR) || '.example.com/q">out2</a>'
       ELSE '' END
    || '<p>' || text || '</p></body></html>'
"""

# Shared graph-build block for the link-analysis operators
# (link_graph_pagerank + link_hits): ONE copy of the host scheme, the
# synthesized pages, the href-parsed edge CTEs, and the node set per
# engine, so the two centralities can never diverge on the graph.
_LG_GRAPH_CTES_DUCK = f"""pages AS (
  SELECT doc_id, 'site' || CAST(doc_id % 20 AS VARCHAR) || '.example.com' AS src,
         {_LG_PAGE_DUCK} AS html
  FROM documents
),
links AS (
  SELECT src, unnest(regexp_extract_all(html, 'href="([^"]*)"', 1)) AS url
  FROM pages
),
edges AS (
  SELECT src, regexp_extract(url, '^https://([^/]+)/', 1) AS dst,
         CAST(COUNT(*) AS BIGINT) AS w
  FROM links
  WHERE regexp_extract(url, '^https://([^/]+)/', 1) <> ''
    AND regexp_extract(url, '^https://([^/]+)/', 1) <> src
  GROUP BY src, dst
),
nodes AS (
  SELECT DISTINCT 'site' || CAST(doc_id % 20 AS VARCHAR) || '.example.com'
    AS node
  FROM documents
)"""


def _lg_host(col: str = "doc_id") -> "F.Column":
    return F.concat(
        F.lit("site"), (F.col(col) % 20).cast("string"), F.lit(".example.com")
    )


def _lg_pages(t) -> DataFrame:
    """(src, html): the synthesized link-bearing page per document."""
    return t.documents.select(
        _lg_host().alias("src"), F.expr(_LG_PAGE_SPARK).alias("html")
    )


def _lg_nodes(t) -> DataFrame:
    return t.documents.select(_lg_host().alias("node")).distinct()


_LINK_PR_ORACLE = f"""
WITH {_LG_GRAPH_CTES_DUCK},
outw AS (
  SELECT src, CAST(SUM(w) AS BIGINT) AS out_w FROM edges GROUP BY src
),
r0 AS (
  SELECT node, CAST({_PR_SCALE} AS BIGINT) AS r FROM nodes
),
r1 AS (
  SELECT nodes.node,
         CAST({_PR_BASE} + COALESCE(SUM(
           (r0.r * e.w * 85) // (o.out_w * 100)), 0) AS BIGINT) AS r
  FROM nodes
  LEFT JOIN edges e ON e.dst = nodes.node
  LEFT JOIN outw o ON o.src = e.src
  LEFT JOIN r0 ON r0.node = e.src
  GROUP BY nodes.node
),
r2 AS (
  SELECT nodes.node,
         CAST({_PR_BASE} + COALESCE(SUM(
           (r1.r * e.w * 85) // (o.out_w * 100)), 0) AS BIGINT) AS r
  FROM nodes
  LEFT JOIN edges e ON e.dst = nodes.node
  LEFT JOIN outw o ON o.src = e.src
  LEFT JOIN r1 ON r1.node = e.src
  GROUP BY nodes.node
),
r3 AS (
  SELECT nodes.node,
         CAST({_PR_BASE} + COALESCE(SUM(
           (r2.r * e.w * 85) // (o.out_w * 100)), 0) AS BIGINT) AS r
  FROM nodes
  LEFT JOIN edges e ON e.dst = nodes.node
  LEFT JOIN outw o ON o.src = e.src
  LEFT JOIN r2 ON r2.node = e.src
  GROUP BY nodes.node
)
SELECT r3.node AS host, r3.r AS rank_fp,
       COALESCE(deg.in_edges, 0) AS in_edges
FROM r3
LEFT JOIN (
  SELECT dst, CAST(COUNT(*) AS BIGINT) AS in_edges FROM edges GROUP BY dst
) deg ON deg.dst = r3.node
"""


def link_edges(pages: DataFrame) -> DataFrame:
    """(src, dst, w) host-level edges from REAL href parsing over a
    (src, html) page frame: extract every ``href="..."``, keep absolute
    https targets (relative nav links fall out because they have no
    host), extract the target host, drop host-level self-loops, and
    weight by link multiplicity. The single corpus-sized stage — one
    scan, a narrow explode, one partial-agg exchange carrying (src,
    dst) host pairs only."""
    return (
        pages.select(
            "src",
            F.explode(
                F.expr("regexp_extract_all(html, 'href=\"([^\"]*)\"', 1)")
            ).alias("url"),
        )
        .select(
            "src",
            F.regexp_extract("url", "^https://([^/]+)/", 1).alias("dst"),
        )
        .filter((F.col("dst") != "") & (F.col("dst") != F.col("src")))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )


@register("link_graph_pagerank", oracle=_LINK_PR_ORACLE)
def link_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over a host graph whose edges come from REAL href
    parsing — the production edge path `domain_pagerank`'s docstring
    promises (its edge stage joins on a synthesized target id; the r7
    verdict flagged that join as the stand-in to replace). Here each
    document gets an in-scan synthesized page whose anchors point at
    OTHER hosts (plus a relative nav link and a host-level self-link,
    both of which the parser must drop), and the edge list is
    ``regexp_extract_all`` → explode → host extraction → (src, dst)
    aggregation — no document-to-document join anywhere.

    Scale shape: the corpus-sized stage is scan + narrow explode with
    ONE partial-agg exchange carrying host pairs (never text, never a
    corpus join); out-weights and the three damped bigint iterations
    run on the host-bounded tables exactly as `domain_pagerank`'s
    (shared `_pr_iteration`, fixed-point floor-div — bit-identical
    across engines). On a real crawl this same plan consumes
    `read_warc` payloads: swap the page synthesis for the WARC body
    column and nothing else changes."""
    t = load_tables(spark, sf_dir)
    edges = link_edges(_lg_pages(t))
    outw = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    # Host-bounded ew/nodes materialized once (the domain_pagerank r15
    # fix): without the truncation every iteration re-embeds the
    # corpus-sized href-parse subtree and AQE stage reuse only
    # partially saves it.
    ew = edges.join(outw, "src").localCheckpoint(eager=True)
    nodes = _lg_nodes(t).localCheckpoint(eager=True)
    ranks = nodes.select("node", F.lit(_PR_SCALE).cast("bigint").alias("r"))
    for _ in range(3):
        ranks = _pr_iteration(nodes, ew, ranks)
    # ew is one row per (src, dst), so counting it per dst equals
    # counting the pre-outw edge list.
    indeg = ew.groupBy("dst").agg(F.count(F.lit(1)).alias("in_edges"))
    return ranks.join(indeg, ranks.node == indeg.dst, "left").select(
        F.col("node").alias("host"),
        F.col("r").alias("rank_fp"),
        F.coalesce("in_edges", F.lit(0)).alias("in_edges"),
    )


# ----------------------------------------------------------- anchor_text_stats

# Page synthesis for the anchor-text signal: each doc links out to two
# hosts with doc-DERIVED anchor text (its first two words) plus a fixed
# "see also" anchor — so target hosts accumulate a real distribution of
# anchors. A relative nav link exercises the parser's drop path.
_AT_PAGE_SPARK = (
    "concat('<html><body><a href=\"/home\">home</a>',"
    " '<a href=\"https://site', cast((doc_id * 31 + 7) % 20 as string),"
    " '.example.com/p', cast(doc_id as string), '\">',"
    " array_join(slice(split(text, ' '), 1, 2), ' '), '</a>',"
    " case when doc_id % 2 = 0 then concat('<a href=\"https://site',"
    " cast(doc_id % 4 as string), '.example.com/q\">see also</a>')"
    " else '' end,"
    " '<p>', text, '</p></body></html>')"
)

_AT_PAGE_DUCK = """
    '<html><body><a href="/home">home</a>'
    || '<a href="https://site' || CAST((doc_id * 31 + 7) % 20 AS VARCHAR)
    || '.example.com/p' || CAST(doc_id AS VARCHAR) || '">'
    || array_to_string(list_slice(string_split(text, ' '), 1, 2), ' ')
    || '</a>'
    || CASE WHEN doc_id % 2 = 0 THEN '<a href="https://site'
         || CAST(doc_id % 4 AS VARCHAR) || '.example.com/q">see also</a>'
       ELSE '' END
    || '<p>' || text || '</p></body></html>'
"""

_AT_TAG = '<a href="https://[^"]*"[^>]*>[^<]*</a>'
_AT_HOST = '<a href="https://([^/"]+)'
_AT_ANCHOR = '>([^<]*)</a>'

_ANCHOR_ORACLE = f"""
WITH pages AS (
  SELECT doc_id, {_AT_PAGE_DUCK} AS html FROM documents
),
tags AS (
  SELECT unnest(regexp_extract_all(html, '{_AT_TAG}')) AS tag FROM pages
),
links AS (
  SELECT regexp_extract(tag, '{_AT_HOST}', 1) AS host,
         regexp_extract(tag, '{_AT_ANCHOR}', 1) AS anchor
  FROM tags
),
counts AS (
  SELECT host, anchor, CAST(COUNT(*) AS BIGINT) AS n
  FROM links GROUP BY host, anchor
),
ranked AS (
  SELECT host, anchor, n,
         row_number() OVER (PARTITION BY host ORDER BY n DESC, anchor) AS rk,
         CAST(SUM(n) OVER (PARTITION BY host) AS BIGINT) AS n_links,
         CAST(COUNT(*) OVER (PARTITION BY host) AS BIGINT) AS n_anchors
  FROM counts
)
SELECT host, n_links, n_anchors, anchor AS top_anchor, n AS top_anchor_n
FROM ranked WHERE rk = 1
"""


@register("anchor_text_stats", oracle=_ANCHOR_ORACLE)
def anchor_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text aggregation per target host — the classic web-corpus
    training signal (anchor text describes the TARGET page; search and
    retrieval pretraining mine it as weak query-document pairs). Pages
    synthesize in-scan with doc-derived anchors; real ``<a ...>...</a>``
    parsing extracts (target host, anchor text) pairs; per host the
    report gives total in-links, distinct anchor count, and the modal
    anchor (count-desc, text-asc tie-break). Relative links have no
    host and fall out of the tag regex, exercising the drop path.

    Scale shape: tag extraction and both regexp group pulls live in the
    scan stage (one narrow explode of matched tags — never the full
    page); the single corpus-sized exchange carries (host, anchor)
    pairs, partial-aggregated map-side. The per-host top-1 runs on the
    already-tiny (host, anchor) count table via a rank-1 window that
    Catalyst rewrites to a WindowGroupLimit partial top-k, and the
    host rollups reuse the same window partitioning — no second
    corpus pass. On a real crawl the page synthesis is replaced by the
    WARC body column, exactly as link_graph_pagerank documents."""
    t = load_tables(spark, sf_dir)
    pages = t.documents.select(F.expr(_AT_PAGE_SPARK).alias("html"))
    tags = pages.select(
        F.explode(
            F.expr(f"regexp_extract_all(html, '{_AT_TAG}', 0)")
        ).alias("tag")
    )
    links = tags.select(
        F.regexp_extract("tag", _AT_HOST, 1).alias("host"),
        F.regexp_extract("tag", _AT_ANCHOR, 1).alias("anchor"),
    )
    counts = links.groupBy("host", "anchor").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("host")
    ranked = counts.select(
        "host",
        "anchor",
        "n",
        F.row_number()
        .over(w.orderBy(F.col("n").desc(), "anchor"))
        .alias("rk"),
        F.sum("n").over(w).alias("n_links"),
        F.count(F.lit(1)).over(w).alias("n_anchors"),
    )
    return ranked.filter(F.col("rk") == 1).select(
        "host",
        "n_links",
        "n_anchors",
        F.col("anchor").alias("top_anchor"),
        F.col("n").alias("top_anchor_n"),
    )


# ------------------------------------------------------------------- link_hits

# HITS (Kleinberg 1999) over the same href-parsed host graph as
# link_graph_pagerank: hubs point AT good pages, authorities are
# pointed at BY good hubs — the complementary centrality crawl
# schedulers use next to PageRank (a high-hub host is a good frontier
# seed even when its own authority is low). Bit-exact fixed point:
# scores live in 1e6-scaled int64 and every iteration MAX-normalizes
# by integer floor division (score·SCALE // max), so both engines walk
# identical integers — the domain_pagerank determinism recipe with
# normalization instead of damping. Two rounds (a1 → h1 → a2).
# Headroom: raw gathers stay int64 (score ≤ SCALE after normalization,
# so raw ≤ SCALE·Σw — overflow only at Σw > ~9.2e12 weighted links
# into ONE host); the normalizer's ·SCALE product is computed in
# 38-digit decimal (Spark) / HUGEINT (DuckDB), so it can NEVER
# overflow — a fix for the r10 advice item where score·SCALE wrapped
# int64 once a host's weighted in-degree passed ~9.2e6.


def _hits_normalize(scores: DataFrame, col: str) -> DataFrame:
    """score·SCALE // max(score) — the max broadcasts as one row; a
    zero max (edgeless graph) maps everything to 0 instead of dividing
    by zero. The product runs in decimal(38,0) so score·SCALE cannot
    wrap int64; `div` truncates toward zero = floor on these
    non-negative values, matching DuckDB's HUGEINT `//`."""
    mx = scores.agg(F.max(col).alias("mx"))
    return scores.crossJoin(F.broadcast(mx)).select(
        "node",
        F.when(F.col("mx") == 0, F.lit(0).cast("bigint"))
        .otherwise(
            F.expr(
                f"cast((cast({col} as decimal(38,0)) * {_PR_SCALE})"
                " div mx as bigint)"
            )
        )
        .alias(col),
    )


_LINK_HITS_ORACLE = f"""
WITH {_LG_GRAPH_CTES_DUCK},
a1r AS (
  SELECT nodes.node,
         CAST(COALESCE(SUM({_PR_SCALE} * e.w), 0) AS BIGINT) AS a
  FROM nodes LEFT JOIN edges e ON e.dst = nodes.node
  GROUP BY nodes.node
),
a1 AS (
  SELECT node, CASE WHEN (SELECT MAX(a) FROM a1r) = 0 THEN 0
    ELSE (CAST(a AS HUGEINT) * {_PR_SCALE}) // (SELECT MAX(a) FROM a1r) END AS a
  FROM a1r
),
h1r AS (
  SELECT nodes.node,
         CAST(COALESCE(SUM(a1.a * e.w), 0) AS BIGINT) AS h
  FROM nodes LEFT JOIN edges e ON e.src = nodes.node
  LEFT JOIN a1 ON a1.node = e.dst
  GROUP BY nodes.node
),
h1 AS (
  SELECT node, CASE WHEN (SELECT MAX(h) FROM h1r) = 0 THEN 0
    ELSE (CAST(h AS HUGEINT) * {_PR_SCALE}) // (SELECT MAX(h) FROM h1r) END AS h
  FROM h1r
),
a2r AS (
  SELECT nodes.node,
         CAST(COALESCE(SUM(h1.h * e.w), 0) AS BIGINT) AS a
  FROM nodes LEFT JOIN edges e ON e.dst = nodes.node
  LEFT JOIN h1 ON h1.node = e.src
  GROUP BY nodes.node
),
a2 AS (
  SELECT node, CASE WHEN (SELECT MAX(a) FROM a2r) = 0 THEN 0
    ELSE (CAST(a AS HUGEINT) * {_PR_SCALE}) // (SELECT MAX(a) FROM a2r) END AS a
  FROM a2r
)
SELECT a2.node AS host, CAST(h1.h AS BIGINT) AS hub_fp,
       CAST(a2.a AS BIGINT) AS auth_fp,
       COALESCE(od.out_edges, 0) AS out_edges,
       COALESCE(id.in_edges, 0) AS in_edges
FROM a2
JOIN h1 ON h1.node = a2.node
LEFT JOIN (SELECT src, CAST(COUNT(*) AS BIGINT) AS out_edges
           FROM edges GROUP BY src) od ON od.src = a2.node
LEFT JOIN (SELECT dst, CAST(COUNT(*) AS BIGINT) AS in_edges
           FROM edges GROUP BY dst) id ON id.dst = a2.node
"""


@register("link_hits", oracle=_LINK_HITS_ORACLE)
def link_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities over the href-parsed host graph — the
    complementary centrality to ``link_graph_pagerank`` a crawl
    scheduler reads (a high-hub host is a frontier seed even at low
    authority). Two max-normalized rounds (a1 → h1 → a2) in 1e6-scaled
    int64 with integer floor-division normalization — both engines
    walk identical integers, the domain_pagerank recipe with
    normalization instead of damping.

    Scale shape: edges come from ``link_edges`` (one scan, narrow
    explode, one (src, dst)-pair exchange — text never moves); every
    HITS round is one host-bounded agg plus a 1-row broadcast max;
    node/edge tables are host-bounded, so iteration cost is
    independent of corpus size after the edge build."""
    t = load_tables(spark, sf_dir)
    # Host-bounded edges/nodes materialized once (the domain_pagerank
    # r15 fix): the three gather rounds plus the degree audits consume
    # edges five times, and the r15 plan audit showed AQE stage reuse
    # only partially covers repeated subtrees — each un-reused copy is
    # a corpus-sized href-parse pass.
    edges = link_edges(_lg_pages(t)).localCheckpoint(eager=True)
    nodes = _lg_nodes(t).localCheckpoint(eager=True)

    def gather(scores: DataFrame, score_col: str, edge_key: str,
               other_key: str, out_col: str) -> DataFrame:
        """out(node) = Σ score(other)·w over edges touching node."""
        e = edges.join(
            scores.withColumnRenamed("node", other_key), other_key
        )
        raw = (
            nodes.join(e, nodes.node == e[edge_key], "left")
            .groupBy("node")
            .agg(
                F.coalesce(
                    F.sum(F.col(score_col) * F.col("w")), F.lit(0)
                ).cast("bigint").alias(out_col)
            )
        )
        return raw

    h0 = nodes.select(
        "node", F.lit(_PR_SCALE).cast("bigint").alias("h")
    )
    a1 = _hits_normalize(
        gather(h0, "h", "dst", "src", "a"), "a"
    )
    h1 = _hits_normalize(
        gather(a1, "a", "src", "dst", "h"), "h"
    )
    a2 = _hits_normalize(
        gather(h1, "h", "dst", "src", "a"), "a"
    )
    outd = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_edges"))
    ind = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("in_edges"))
    res = (
        a2.join(h1, "node")
        .join(outd, a2.node == outd.src, "left")
        .join(ind, a2.node == ind.dst, "left")
        .select(
            F.col("node").alias("host"),
            F.col("h").alias("hub_fp"),
            F.col("a").alias("auth_fp"),
            F.coalesce("out_edges", F.lit(0)).cast("bigint").alias("out_edges"),
            F.coalesce("in_edges", F.lit(0)).cast("bigint").alias("in_edges"),
        )
    )
    return res
