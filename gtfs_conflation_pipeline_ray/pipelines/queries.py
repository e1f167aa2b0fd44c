"""Driver-facing query registry: every implemented operator from SURVEY.md §2
(plus the training-data-pipeline additions) as a ``(sf_dir) -> Dataset``
callable, paired with an exact DuckDB oracle SQL string where the semantics
are SQL-expressible.

Cross-engine exactness: value aggregates are quantized per row to int64
"cents" (``functions.numeric.cents`` ≙ ``CAST(FLOOR(x*100+0.5) AS BIGINT)``)
so sums compare exactly regardless of reduction order; ratios are divisions of
exact ints; timestamps are emitted as strings; ranks carry explicit unique
tie-breakers. Column names match the SQL aliases one-for-one.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
from ray.data.aggregate import Count, Max, Min, Sum

from ..functions.numeric import cents
from ..sources import testdata as td
from ..stages import ann, dedup, media as mstage, relational as rel, spatial, textops, windows
from . import conflation

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _rp(sf_dir: str, table: str, columns=None):
    """Column-pruned parquet read with the few-file block-count override
    (``conflation._auto_blocks``): Ray's default splits a single file into
    2x-CPU tiny blocks and each extra block multiplies downstream
    scheduling + combine partials (measured: polygon probe 3.6s -> 2.1s,
    pagerank 8.9s -> 7.5s at sf0.1). No-op for many-file inputs."""
    from .conflation import _auto_blocks

    path = f"{sf_dir}/{table}.parquet"
    return ray.data.read_parquet(path, columns=columns,
                                 override_num_blocks=_auto_blocks(path))


def _image_fixture_synth(batch: pa.Table) -> pa.Table:
    """THE shared image fixture of the media query suite (31 queries): per
    doc_id, a (12..24)x(16..40) RGB image with a horizontal dequant-exact
    gradient on R, a vertical one on G, and a constant B; formats cycle
    bmp/png/jpeg(QJPG stand-in) by doc_id%3. Every image_* oracle replays
    this closed form (see q_image_decode_features)."""
    from ..functions import codecs

    fmts3 = ["bmp", "png", "jpeg"]
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    blobs, fmts = [], []
    for i in ids:
        w, h = int(16 + (i % 4) * 8), int(12 + (i % 3) * 6)
        grad = ((np.arange(w, dtype=np.int64) * 55) // (w - 1)).astype(np.uint8)
        vgrad = ((np.arange(h, dtype=np.int64) * 41) // (h - 1)).astype(np.uint8)
        img = np.empty((h, w, 3), dtype=np.uint8)
        img[:, :, 0] = np.uint8((i * 7) % 200) + grad[None, :]
        img[:, :, 1] = np.uint8((i * 11) % 200) + vgrad[:, None]
        img[:, :, 2] = (i * 3) % 200
        fmt = fmts3[int(i % 3)]
        blobs.append(codecs.encode(img, fmt))
        fmts.append(fmt)
    return pa.table({
        "image_id": ids,
        "bytes": pa.array(blobs, type=pa.binary()),
        "fmt": pa.array(fmts, type=pa.string()),
    })


# the shared image-fixture CTE every gradient-image oracle starts from
# (dims + per-channel base colors of _image_fixture_synth)
_SQL_IM3 = """im AS (
  SELECT doc_id AS image_id,
         16 + (doc_id % 4) * 8 AS w, 12 + (doc_id % 3) * 6 AS h,
         doc_id % 3 AS fi,
         (doc_id * 7) % 200 AS br, (doc_id * 11) % 200 AS bg,
         (doc_id * 3) % 200 AS bb
  FROM documents
)"""

def _nrows(sf_dir: str, table: str) -> int:
    """Row count from parquet FOOTER metadata only (no data scan) — sizes the
    grouped-combine bucket count to the data, not the CPU count."""
    return pq.ParquetFile(f"{sf_dir}/{table}.parquet").metadata.num_rows


def _with_cents(col_expr_name: str, out: str, scale: int = 100):
    def _f(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            out, pa.array(cents(batch[col_expr_name].to_numpy(zero_copy_only=False), scale))
        )

    return _f


_CTES = f"""WITH points AS ({td.POINTS_SQL}),
cpoints AS ({td.CPOINTS_SQL}),
tiles AS ({td.TILES_SQL})
"""

# ---------------------------------------------------------------------------
# spatial flagship (SURVEY §2: J4/J5/J9, M4, O1)
# ---------------------------------------------------------------------------

def q_spatial_join_pairs(sf_dir: str):
    return conflation.spatial_join_pairs(sf_dir)


SQL_SPATIAL_JOIN_PAIRS = _CTES + """
SELECT p.point_id, t.tile_id, t.ref_id, t.level
FROM points p JOIN tiles t
  ON p.px BETWEEN t.cx - t.hw AND t.cx + t.hw
 AND p.py BETWEEN t.cy - t.hh AND t.cy + t.hh
"""


def q_spatial_join_pairs_sharded(sf_dir: str):
    """Same pairs, reference side x-range sharded (beyond-worker-memory
    regime): forces ``spatial.shard_tiles`` + ``sharded_candidate_join`` so
    the 100-TB code path is driver-hash-verified, not just pytest-parity."""
    return conflation.spatial_join_pairs_sharded(sf_dir)


def q_spatial_join_pairs_strtree(sf_dir: str):
    """Same pairs through the packed STR R-tree backend
    (``state/strtree.py``) instead of the uniform grid — the north star's
    "STRtree-backed" candidate join, sharing ``SQL_SPATIAL_JOIN_PAIRS``."""
    return conflation.spatial_join_pairs(sf_dir, backend="strtree")


def q_knn_tiles_strtree(sf_dir: str):
    """kNN join through the STR R-tree's box-doubling exact kNN; shares
    ``SQL_KNN_TILES`` with the grid-pruned variant."""
    cust = _rp(sf_dir, "customer", ["c_custkey"]).map_batches(
        td.cpoints_batch, batch_format="pyarrow", batch_size=8192
    )
    ref = conflation.tiles_ref(sf_dir)
    out = spatial.knn_join(cust, ref, 3, "cx", "cy", ["c_custkey"],
                           backend="strtree")
    return out.select_columns(["c_custkey", "tile_id", "knn_rank", "dist2"])


def q_point_in_polygon(sf_dir: str):
    """TRUE point-in-polygon join (``spatial.point_in_polygon_join``): bbox
    grid-index candidates refined by the integer-exact crossing-parity test
    over per-tile hexagons. ≙ the reference's geopoly_contains_point probe
    (``ConflationMapDAO/generators.js:9-47``) — the rect joins cover only the
    bbox half of that semantics."""
    pts = conflation.read_points(sf_dir)  # auto-blocked few-file read
    return spatial.point_in_polygon_counts(
        pts, conflation.tiles_ref(sf_dir), "px", "py")


# hexagon vertices e=0..5: (cx+hw,cy) (cx+h2,cy+hh) (cx-h2,cy+hh) (cx-hw,cy)
# (cx-h2,cy-hh) (cx+h2,cy-hh); edge e runs v_e -> v_{(e+1)%6}. The crossing
# predicate is the same division-free int64 form the engine evaluates.
SQL_POINT_IN_POLYGON = _CTES + """,
verts AS (
  SELECT t.tile_id, e.e,
         CASE e.e WHEN 0 THEN t.cx + t.hw WHEN 1 THEN t.cx + t.hw // 2
                  WHEN 2 THEN t.cx - t.hw // 2 WHEN 3 THEN t.cx - t.hw
                  WHEN 4 THEN t.cx - t.hw // 2 ELSE t.cx + t.hw // 2 END AS vx,
         CASE e.e WHEN 0 THEN t.cy WHEN 1 THEN t.cy + t.hh
                  WHEN 2 THEN t.cy + t.hh WHEN 3 THEN t.cy
                  ELSE t.cy - t.hh END AS vy
  FROM tiles t, (SELECT unnest(range(6)) AS e) e
),
edges AS (
  SELECT a.tile_id, a.vx AS x1, a.vy AS y1, b.vx AS x2, b.vy AS y2
  FROM verts a JOIN verts b
    ON b.tile_id = a.tile_id AND b.e = (a.e + 1) % 6
),
cand AS (
  SELECT p.point_id, p.px, p.py, t.tile_id
  FROM points p JOIN tiles t
    ON p.px BETWEEN t.cx - t.hw AND t.cx + t.hw
   AND p.py BETWEEN t.cy - t.hh AND t.cy + t.hh
),
inside AS (
  SELECT c.point_id, c.tile_id
  FROM cand c JOIN edges e USING (tile_id)
  GROUP BY c.point_id, c.tile_id
  HAVING SUM(CASE WHEN ((e.y1 > c.py) != (e.y2 > c.py))
                   AND ( (e.y2 > e.y1 AND
                          (c.px - e.x1) * (e.y2 - e.y1) - (c.py - e.y1) * (e.x2 - e.x1) < 0)
                      OR (e.y2 < e.y1 AND
                          (c.px - e.x1) * (e.y2 - e.y1) - (c.py - e.y1) * (e.x2 - e.x1) > 0) )
                  THEN 1 ELSE 0 END) % 2 = 1
)
SELECT tile_id, COUNT(*) AS n_inside FROM inside GROUP BY tile_id
"""


def q_spatial_tile_stats(sf_dir: str):
    return conflation.tile_stats(sf_dir)


SQL_SPATIAL_TILE_STATS = _CTES + """
SELECT t.tile_id,
       CAST(SUM(CAST(FLOOR(p.l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_c,
       COUNT(*) AS n_points
FROM points p JOIN tiles t
  ON p.px BETWEEN t.cx - t.hw AND t.cx + t.hw
 AND p.py BETWEEN t.cy - t.hh AND t.cy + t.hh
GROUP BY t.tile_id
"""


def q_knn_tiles(sf_dir: str):
    cust = _rp(sf_dir, "customer", ["c_custkey"]).map_batches(
        td.cpoints_batch, batch_format="pyarrow", batch_size=8192
    )
    ref = conflation.tiles_ref(sf_dir)
    out = spatial.knn_join(cust, ref, 3, "cx", "cy", ["c_custkey"])
    return out.select_columns(["c_custkey", "tile_id", "knn_rank", "dist2"])


SQL_KNN_TILES = _CTES + """
SELECT c_custkey, tile_id, knn_rank, dist2 FROM (
  SELECT p.c_custkey, t.tile_id,
         (p.cx - t.cx) * (p.cx - t.cx) + (p.cy - t.cy) * (p.cy - t.cy) AS dist2,
         ROW_NUMBER() OVER (
           PARTITION BY p.c_custkey
           ORDER BY (p.cx - t.cx) * (p.cx - t.cx) + (p.cy - t.cy) * (p.cy - t.cy), t.tile_id
         ) AS knn_rank
  FROM cpoints p CROSS JOIN tiles t
) WHERE knn_rank <= 3
"""


def q_tile_assign_multilevel(sf_dir: str):
    pts = conflation.read_points(sf_dir)
    cellped = spatial.assign_cells(pts, "px", "py", [256, 1024, 4096])
    return rel.partial_groupby_sum(
        cellped, ["level_size", "cell_x", "cell_y"], [], count_as="n_points"
    )


SQL_TILE_ASSIGN = _CTES + """
SELECT lv.level_size, p.px // lv.level_size AS cell_x, p.py // lv.level_size AS cell_y,
       COUNT(*) AS n_points
FROM points p CROSS JOIN (VALUES (256), (1024), (4096)) lv(level_size)
GROUP BY 1, 2, 3
"""


def q_tile_overlap_pairs(sf_dir: str):
    tiles = td.tiles_table(sf_dir)
    ref = ray.put(tiles)

    def _corners(batch: pa.Table) -> pa.Table:
        cx = batch["cx"].to_numpy(zero_copy_only=False)
        cy = batch["cy"].to_numpy(zero_copy_only=False)
        hw = batch["hw"].to_numpy(zero_copy_only=False)
        hh = batch["hh"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "tile_id": batch["tile_id"],
                "x0": cx - hw,
                "y0": cy - hh,
                "x1": cx + hw,
                "y1": cy + hh,
            }
        )

    # from_arrow yields ONE block and map_batches parallelism is per-BLOCK —
    # a single-block probe side serializes the whole self-join onto one core
    # (the round-2 regression). Pre-split into ~2k-row blocks so the probe
    # fans out across the cluster.
    chunks = [tiles.slice(s, 2048) for s in range(0, tiles.num_rows, 2048)]
    tiles_ds = ray.data.from_arrow(chunks).map_batches(
        _corners, batch_format="pyarrow", batch_size=8192
    )
    return spatial.tile_overlap_pairs(tiles_ds, ref)


SQL_TILE_OVERLAP = _CTES + """
SELECT a.tile_id AS tile_a, b.tile_id AS tile_b,
       (LEAST(a.cx + a.hw, b.cx + b.hw) - GREATEST(a.cx - a.hw, b.cx - b.hw))
     * (LEAST(a.cy + a.hh, b.cy + b.hh) - GREATEST(a.cy - a.hh, b.cy - b.hh)) AS inter_area
FROM tiles a JOIN tiles b
  ON a.tile_id < b.tile_id
 AND a.cx - a.hw < b.cx + b.hw AND a.cx + a.hw > b.cx - b.hw
 AND a.cy - a.hh < b.cy + b.hh AND a.cy + a.hh > b.cy - b.hh
"""


def q_cell_point_counts(sf_dir: str):
    from ..functions.cells import grid_cell

    pts = conflation.read_points(sf_dir)

    def _cell(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cell_id": grid_cell(
                    batch["px"].to_numpy(zero_copy_only=False),
                    batch["py"].to_numpy(zero_copy_only=False),
                    1024,
                    64,
                )
            }
        )

    cells = pts.map_batches(_cell, batch_format="pyarrow", batch_size=8192)
    return rel.partial_groupby_sum(cells, ["cell_id"], [], count_as="n_points")


SQL_CELL_COUNTS = _CTES + """
SELECT (p.py // 1024) * 64 + (p.px // 1024) AS cell_id, COUNT(*) AS n_points
FROM points p GROUP BY 1
"""

# ---------------------------------------------------------------------------
# relational core (SURVEY §2: A3-A9, J1-J8, O2-O6, D1/D7)
# ---------------------------------------------------------------------------

def q_pricing_summary(sf_dir: str):
    li = _rp(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def _derive(batch: pa.Table) -> pa.Table:
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "sum_qty_c": cents(qty),
                "sum_base_c": cents(price),
                "sum_disc_c": cents(price * (1.0 - disc)),
            }
        )

    d = li.map_batches(_derive, batch_format="pyarrow", batch_size=8192)
    return rel.partial_groupby_sum(
        d, ["l_returnflag", "l_linestatus"], ["sum_qty_c", "sum_base_c", "sum_disc_c"],
        count_as="n_rows",
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_c,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_c,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_c,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def _revenue_per_order(sf_dir: str):
    li = _rp(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def _rev(batch: pa.Table) -> pa.Table:
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"l_orderkey": batch["l_orderkey"], "revenue_c": cents(price * (1.0 - disc))}
        )

    d = li.map_batches(_rev, batch_format="pyarrow", batch_size=8192)
    return rel.partial_groupby_sum(d, ["l_orderkey"], ["revenue_c"],
                                   est_rows=_nrows(sf_dir, "lineitem"))


def q_order_priority_revenue(sf_dir: str):
    rev = _revenue_per_order(sf_dir)
    orders = _rp(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = orders.join(rev, "inner", 8, on=("o_orderkey",), right_on=("l_orderkey",))
    return rel.partial_groupby_sum(joined, ["o_orderpriority"], ["revenue_c"], count_as="n_orders")


SQL_ORDER_PRIORITY_REVENUE = """
WITH rev AS (
  SELECT l_orderkey,
         SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT)) AS revenue_c
  FROM lineitem GROUP BY 1
)
SELECT o_orderpriority, CAST(SUM(rev.revenue_c) AS BIGINT) AS revenue_c, COUNT(*) AS n_orders
FROM orders JOIN rev ON o_orderkey = rev.l_orderkey
GROUP BY o_orderpriority
"""


def q_nation_revenue(sf_dir: str):
    rev = _revenue_per_order(sf_dir)
    orders = _rp(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _rp(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j1 = orders.join(rev, "inner", 8, on=("o_orderkey",), right_on=("l_orderkey",))
    # pre-aggregate to CUSTOMER grain before the dimension join: the second
    # hash join then exchanges n_cust rows instead of n_orders (10x less in
    # TPC-H shape; the groupby itself is a combiner-first bucketed shuffle)
    bycust = rel.partial_groupby_sum(j1, ["o_custkey"], ["revenue_c"],
                                     est_rows=_nrows(sf_dir, "orders"))
    j2 = bycust.join(cust, "inner", 8, on=("o_custkey",), right_on=("c_custkey",))
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]).set_index(
        "n_nationkey"
    )
    looked = rel.broadcast_lookup(j2, ray.put(nation), "c_nationkey", {"n_name": "n_name"})
    return rel.partial_groupby_sum(looked, ["n_name"], ["revenue_c"])


SQL_NATION_REVENUE = """
WITH rev AS (
  SELECT l_orderkey,
         SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT)) AS revenue_c
  FROM lineitem GROUP BY 1
)
SELECT n_name, CAST(SUM(rev.revenue_c) AS BIGINT) AS revenue_c
FROM orders
JOIN rev ON o_orderkey = rev.l_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_order_line_counts(sf_dir: str):
    li = _rp(sf_dir, "lineitem", ["l_orderkey"])
    cnt = rel.partial_groupby_sum(li, ["l_orderkey"], [], count_as="n_lines",
                                  est_rows=_nrows(sf_dir, "lineitem"))
    orders = _rp(sf_dir, "orders", ["o_orderkey"])
    joined = orders.join(cnt, "left_outer", 8, on=("o_orderkey",), right_on=("l_orderkey",))

    def _fill(batch: pa.Table) -> pa.Table:
        n = pc.fill_null(batch["n_lines"], 0)
        return pa.table({"o_orderkey": batch["o_orderkey"], "n_lines": pc.cast(n, pa.int64())})

    return joined.map_batches(_fill, batch_format="pyarrow", batch_size=8192)


SQL_ORDER_LINE_COUNTS = """
SELECT o_orderkey, CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n_lines
FROM orders LEFT JOIN (
  SELECT l_orderkey, COUNT(*) AS n FROM lineitem GROUP BY 1
) cnt ON o_orderkey = cnt.l_orderkey
"""


def q_customers_no_orders(sf_dir: str):
    # Broadcast anti-join: the distinct order-customer key set is dimension-
    # sized, so collect it once (per-batch dedup combiner inside `unique`) and
    # filter the probe side map-side — no all-to-all shuffle. (Ray 2.49's
    # native `left_anti` join returns empty results, so it is not used.)
    cust = _rp(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    cust = cust.map_batches(_with_cents("c_acctbal", "acctbal_c"), batch_format="pyarrow")
    cust = cust.select_columns(["c_custkey", "acctbal_c"])
    recent = _rp(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
        lambda t: t.filter(pc.less(t["o_orderdate"], pa.scalar(np.datetime64("1996-01-01", "us")))),
        batch_format="pyarrow",
    )
    okeys = np.array(recent.unique("o_custkey"), dtype=np.int64)
    return rel.anti_join_keys(cust, "c_custkey", ray.put(okeys))


SQL_CUSTOMERS_NO_ORDERS = """
SELECT c_custkey, CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_c
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderdate < TIMESTAMP '1996-01-01'
)
"""


def q_event_window_join(sf_dir: str):
    # window side: filter pushed into the parquet read (row-group pruning +
    # only matching rows decoded) — the driver never holds the full fact table
    wtab = pq.read_table(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
        filters=[("event_type", "==", "signup")],
    ).select(["event_id", "user_id", "ts"])
    wtab = wtab.rename_columns(["window_id", "user_id", "ts"])
    wref = ray.put(wtab)
    probes = _rp(sf_dir, "events", ["user_id", "ts", "event_type", "value"])
    probes = probes.map_batches(
        lambda t: t.filter(pc.is_in(t["event_type"], value_set=pa.array(["click", "view", "purchase"]))),
        batch_format="pyarrow",
    )
    joined = windows.interval_join(probes, wref, "user_id", "ts", 2 * 3600 * 1_000_000)
    joined = joined.map_batches(_with_cents("value", "value_c"), batch_format="pyarrow")
    return rel.partial_groupby_sum(joined, ["window_id"], ["value_c"], count_as="n_events")


SQL_EVENT_WINDOW_JOIN = """
SELECT w.event_id AS window_id,
       CAST(SUM(CAST(FLOOR(p.value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_c,
       COUNT(*) AS n_events
FROM events w JOIN events p
  ON p.user_id = w.user_id
 AND p.ts >= w.ts AND p.ts < w.ts + INTERVAL 2 HOUR
WHERE w.event_type = 'signup' AND p.event_type IN ('click', 'view', 'purchase')
GROUP BY 1
"""


def q_price_rank_topk(sf_dir: str):
    li = _rp(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_extendedprice"])
    ranked = rel.group_topk(
        li,
        ["l_orderkey"],
        [("l_extendedprice", False), ("l_linenumber", True)],
        k=2,
        rank_col="price_rank",
        est_rows=_nrows(sf_dir, "lineitem"),
    )
    return ranked.select_columns(["l_orderkey", "l_linenumber", "price_rank"])


SQL_PRICE_RANK_TOPK = """
SELECT l_orderkey, l_linenumber, price_rank FROM (
  SELECT l_orderkey, l_linenumber,
         ROW_NUMBER() OVER (
           PARTITION BY l_orderkey ORDER BY l_extendedprice DESC, l_linenumber
         ) AS price_rank
  FROM lineitem
) WHERE price_rank <= 2
"""


def q_supplier_top_line(sf_dir: str):
    li = _rp(sf_dir, "lineitem", ["l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"])

    def _rev(batch: pa.Table) -> pa.Table:
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_suppkey": batch["l_suppkey"],
                "l_orderkey": batch["l_orderkey"],
                "l_linenumber": batch["l_linenumber"],
                "revenue_c": cents(price * (1.0 - disc)),
            }
        )

    d = li.map_batches(_rev, batch_format="pyarrow", batch_size=8192)
    return rel.group_topk(
        d,
        ["l_suppkey"],
        [("revenue_c", False), ("l_orderkey", True), ("l_linenumber", True)],
        k=1,
        est_rows=_nrows(sf_dir, "lineitem"),
    )


SQL_SUPPLIER_TOP_LINE = """
SELECT l_suppkey, l_orderkey, l_linenumber, revenue_c FROM (
  SELECT l_suppkey, l_orderkey, l_linenumber,
         CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT) AS revenue_c,
         ROW_NUMBER() OVER (
           PARTITION BY l_suppkey
           ORDER BY CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT) DESC,
                    l_orderkey, l_linenumber
         ) AS rn
  FROM lineitem
) WHERE rn = 1
"""


def q_top_orders(sf_dir: str):
    orders = _rp(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    orders = orders.map_batches(_with_cents("o_totalprice", "totalprice_c"), batch_format="pyarrow")
    orders = orders.select_columns(["o_orderkey", "totalprice_c"])
    return orders.sort(["totalprice_c", "o_orderkey"], descending=[True, False]).limit(10)


SQL_TOP_ORDERS = """
SELECT o_orderkey, CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS totalprice_c
FROM orders ORDER BY totalprice_c DESC, o_orderkey LIMIT 10
"""


def q_segment_union_except(sf_dir: str):
    cust = _rp(sf_dir, "customer", ["c_custkey", "c_mktsegment", "c_acctbal"])
    b = cust.filter(expr="c_mktsegment == 'BUILDING'").select_columns(["c_custkey"])
    a = cust.filter(expr="c_mktsegment == 'AUTOMOBILE'").select_columns(["c_custkey"])
    unioned = rel.distinct(b.union(a), ["c_custkey"])
    neg_keys = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey"],
                             filters=[("c_acctbal", "<", 0.0)])["c_custkey"].to_numpy()
    return rel.anti_join_keys(unioned, "c_custkey", ray.put(neg_keys))


SQL_SEGMENT_UNION_EXCEPT = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
UNION
SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
EXCEPT
SELECT c_custkey FROM customer WHERE c_acctbal < 0
"""


def q_distinct_flag_status(sf_dir: str):
    li = _rp(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"])
    return rel.distinct(li, ["l_returnflag", "l_linestatus"])


SQL_DISTINCT_FLAG_STATUS = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


def q_weighted_avg_price(sf_dir: str):
    li = _rp(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice", "l_discount"])

    def _derive(batch: pa.Table) -> pa.Table:
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "disc_c": cents(price * (1.0 - disc)),
                "qty_c": cents(qty),
            }
        )

    d = li.map_batches(_derive, batch_format="pyarrow", batch_size=8192)
    agg = rel.partial_groupby_sum(d, ["l_returnflag"], ["disc_c", "qty_c"], count_as="n_rows")

    def _ratio(batch: pa.Table) -> pa.Table:
        w = batch["disc_c"].to_numpy(zero_copy_only=False).astype(np.float64) / batch[
            "qty_c"
        ].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {"l_returnflag": batch["l_returnflag"], "wavg": w, "n_rows": batch["n_rows"]}
        )

    return agg.map_batches(_ratio, batch_format="pyarrow")


SQL_WEIGHTED_AVG_PRICE = """
SELECT l_returnflag,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT)) AS DOUBLE)
       / CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS DOUBLE) AS wavg,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


def q_season_bucket(sf_dir: str):
    li = _rp(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_shipdate"])

    def _derive(batch: pa.Table) -> pa.Table:
        month = pc.month(batch["l_shipdate"]).to_numpy(zero_copy_only=False)
        season = np.select(
            [np.isin(month, (12, 1, 2)), np.isin(month, (3, 4, 5)), np.isin(month, (6, 7, 8))],
            ["WIN", "SPR", "SUM"],
            default="FAL",
        )
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "season": season,
                "qty_c": cents(batch["l_quantity"].to_numpy(zero_copy_only=False)),
            }
        )

    d = li.map_batches(_derive, batch_format="pyarrow", batch_size=8192)
    agg = rel.partial_groupby_sum(d, ["l_returnflag", "season"], ["qty_c"])
    return agg.map_batches(
        lambda t: t.rename_columns(["l_returnflag", "season", "sum_qty_c"]),
        batch_format="pyarrow",
    )


SQL_SEASON_BUCKET = """
SELECT l_returnflag,
       CASE WHEN EXTRACT(MONTH FROM l_shipdate) IN (12, 1, 2) THEN 'WIN'
            WHEN EXTRACT(MONTH FROM l_shipdate) IN (3, 4, 5) THEN 'SPR'
            WHEN EXTRACT(MONTH FROM l_shipdate) IN (6, 7, 8) THEN 'SUM'
            ELSE 'FAL' END AS season,
       CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_c
FROM lineitem GROUP BY 1, 2
"""


def q_feed_extent(sf_dir: str):
    li = _rp(sf_dir, "lineitem", ["l_shipdate"])

    def _i64(batch: pa.Table) -> pa.Table:
        v = batch["l_shipdate"].cast(pa.int64())
        return pa.table({"sd": v})

    d = li.map_batches(_i64, batch_format="pyarrow", batch_size=8192)
    res = d.aggregate(Min("sd"), Max("sd"), Count(alias_name="n_lines"))
    fmt = lambda us: str(np.datetime64(int(us), "us").astype("datetime64[D]"))
    return pa.table(
        {
            "min_shipdate": [fmt(res["min(sd)"])],
            "max_shipdate": [fmt(res["max(sd)"])],
            "n_lines": pa.array([res["n_lines"]], type=pa.int64()),
        }
    )


SQL_FEED_EXTENT = """
SELECT strftime(MIN(l_shipdate), '%Y-%m-%d') AS min_shipdate,
       strftime(MAX(l_shipdate), '%Y-%m-%d') AS max_shipdate,
       COUNT(*) AS n_lines
FROM lineitem
"""


def q_order_lines_concat(sf_dir: str):
    li = _rp(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])
    return rel.group_concat(li, ["l_orderkey"], "l_linenumber", "lines",
                            est_rows=_nrows(sf_dir, "lineitem"))


SQL_ORDER_LINES_CONCAT = """
SELECT l_orderkey,
       string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS lines
FROM lineitem GROUP BY l_orderkey
"""


def q_order_suppliers_concat(sf_dir: str):
    """Per order: sorted DISTINCT supplier list (zero-padded so string order
    equals numeric order) — ≙ A4 ``group_concat(DISTINCT trip_id)``
    (``GtfsConflationScheduleJoinDAO/createTableFns.js:26-78``)."""
    li = _rp(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])
    return rel.group_concat(li, ["l_orderkey"], "l_suppkey", "suppliers",
                            distinct=True, fmt=lambda v: f"{v:05d}",
                            est_rows=_nrows(sf_dir, "lineitem"))


SQL_ORDER_SUPPLIERS_CONCAT = """
SELECT l_orderkey,
       string_agg(DISTINCT lpad(CAST(l_suppkey AS VARCHAR), 5, '0'), ','
                  ORDER BY lpad(CAST(l_suppkey AS VARCHAR), 5, '0')) AS suppliers
FROM lineitem GROUP BY l_orderkey
"""


def q_date_order_counts(sf_dir: str):
    orders = _rp(sf_dir, "orders", ["o_orderdate"])

    def _i64(batch: pa.Table) -> pa.Table:
        return pa.table({"od": pc.floor_temporal(batch["o_orderdate"], unit="day").cast(pa.int64())})

    d = orders.map_batches(_i64, batch_format="pyarrow", batch_size=8192)
    m = d.aggregate(Min("od"))["min(od)"]
    day_us = 86400 * 1_000_000
    in_window = d.filter(expr=f"od >= {m} and od < {m + 30 * day_us}")
    counts = rel.partial_groupby_sum(in_window, ["od"], [], count_as="n").to_pandas()
    lut = dict(zip(counts["od"], counts["n"]))
    days = np.arange(30, dtype=np.int64) * day_us + m
    return pa.table(
        {
            "d": [str(np.datetime64(int(u), "us").astype("datetime64[D]")) for u in days],
            "n_orders": np.array([lut.get(u, 0) for u in days], dtype=np.int64),
        }
    )


SQL_DATE_ORDER_COUNTS = """
WITH mn AS (SELECT MIN(date_trunc('day', o_orderdate)) AS m FROM orders),
days AS (SELECT m + x * INTERVAL 1 DAY AS day, m FROM mn,
         (SELECT unnest(generate_series(0, 29)) AS x)),
cnt AS (SELECT date_trunc('day', o_orderdate) AS day, COUNT(*) AS n
        FROM orders GROUP BY 1)
SELECT strftime(days.day, '%Y-%m-%d') AS d, CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n_orders
FROM days LEFT JOIN cnt ON days.day = cnt.day
"""

# ---------------------------------------------------------------------------
# stream-shaped (events)
# ---------------------------------------------------------------------------

def q_events_sessionize(sf_dir: str):
    ev = _rp(sf_dir, "events", ["user_id", "ts"])
    return windows.sessionize(ev, "user_id", "ts", 1800)


SQL_EVENTS_SESSIONIZE = """
SELECT user_id,
       CAST(1 + SUM(CASE WHEN p IS NOT NULL AND ts - p > INTERVAL 30 MINUTE
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
FROM (SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS p FROM events)
GROUP BY user_id
"""


def q_events_tumbling(sf_dir: str):
    ev = _rp(sf_dir, "events", ["event_type", "ts", "value"])
    ev = windows.tumbling_window(ev, "ts")
    ev = ev.map_batches(_with_cents("value", "value_c"), batch_format="pyarrow")
    return rel.partial_groupby_sum(ev, ["event_type", "hour_ts"], ["value_c"], count_as="n_events")


SQL_EVENTS_TUMBLING = """
SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour_ts,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_c,
       COUNT(*) AS n_events
FROM events GROUP BY 1, 2
"""


def q_event_props_parse(sf_dir: str):
    """Parse the stringified-JSON ``props`` column and bucket/aggregate the
    extracted field — ≙ M6 stringified-feature parser
    (``src/utils/toParsedFeaturesIterator.js:10-14``) + A7 bucketing.
    Vectorized: orjson-free stdlib parse per batch (hot path would move this
    to Arrow's JSON kernels once payloads are structs)."""
    import json

    ev = _rp(sf_dir, "events", ["event_type", "props"])

    def _parse(batch: pa.Table) -> pa.Table:
        ks = np.fromiter(
            (json.loads(p).get("k", -1) for p in batch["props"].to_pylist()),
            np.int64,
            batch.num_rows,
        )
        return pa.table(
            {"event_type": batch["event_type"], "k_bucket": ks // 10, "k": ks}
        )

    d = ev.map_batches(_parse, batch_format="pyarrow", batch_size=8192)
    return rel.partial_groupby_sum(d, ["event_type", "k_bucket"], ["k"], count_as="n")


SQL_EVENT_PROPS_PARSE = """
SELECT event_type,
       CAST(json_extract(props, '$.k') AS BIGINT) // 10 AS k_bucket,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k,
       COUNT(*) AS n
FROM events GROUP BY 1, 2
"""


def q_events_hopping(sf_dir: str):
    """Overlapping hopping-window aggregate (1h window, 30min hop): each
    event contributes to 2 windows — the sliding-window family the tumbling
    query can't express."""
    ev = _rp(sf_dir, "events", ["event_type", "ts", "value"])
    ev = ev.map_batches(_with_cents("value", "value_c"), batch_format="pyarrow")
    hopped = windows.hopping_window(ev.select_columns(["event_type", "ts", "value_c"]),
                                    "ts", size_s=3600, hop_s=1800)
    return rel.partial_groupby_sum(hopped, ["event_type", "win_start_s"],
                                   ["value_c"], count_as="n_events")


SQL_EVENTS_HOPPING = """
SELECT event_type,
       (epoch_us(ts) // (1800 * 1000000) - j.j) * 1800 AS win_start_s,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_c,
       COUNT(*) AS n_events
FROM events CROSS JOIN (VALUES (0), (1)) j(j)
GROUP BY 1, 2
"""


def q_events_asof(sf_dir: str):
    """Backward as-of join: each click/view event annotated with the SAME
    user's most recent purchase at-or-before it (ties -> largest event_id)
    and the exact microsecond lag — the classic as-of/point-in-time join the
    interval join can't express (it returns ALL windows in range; as-of
    returns exactly the latest). Reference side broadcast once
    (``windows.asof_join``); unmatched rows carry -1."""
    ptab = pq.read_table(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
        filters=[("event_type", "==", "purchase")],
    ).select(["event_id", "user_id", "ts"])
    ptab = ptab.rename_columns(["purchase_id", "user_id", "ts"])
    probes = _rp(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    probes = probes.map_batches(
        lambda t: t.filter(pc.is_in(t["event_type"], value_set=pa.array(["click", "view"]))),
        batch_format="pyarrow",
    ).select_columns(["event_id", "user_id", "ts"])
    joined = windows.asof_join(probes, ray.put(ptab), "user_id", "ts", "purchase_id")
    return joined.select_columns(["event_id", "user_id", "purchase_id", "lag_us"])


SQL_EVENTS_ASOF = """
SELECT e.event_id, e.user_id,
       COALESCE(x.purchase_id, -1) AS purchase_id,
       COALESCE(epoch_us(e.ts) - epoch_us(x.ts), -1) AS lag_us
FROM events e LEFT JOIN LATERAL (
  SELECT p.event_id AS purchase_id, p.ts FROM events p
  WHERE p.event_type = 'purchase' AND p.user_id = e.user_id AND p.ts <= e.ts
  ORDER BY p.ts DESC, p.event_id DESC LIMIT 1
) x ON true
WHERE e.event_type IN ('click', 'view')
"""


def q_events_distinct_users(sf_dir: str):
    ev = _rp(sf_dir, "events", ["event_type", "user_id"])
    pairs = rel.distinct(ev, ["event_type", "user_id"])
    return rel.partial_groupby_sum(pairs, ["event_type"], [], count_as="n_users")


SQL_EVENTS_DISTINCT_USERS = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users FROM events GROUP BY 1
"""

# ---------------------------------------------------------------------------
# documents: text analysis + dedup (training-data-pipeline operators)
# ---------------------------------------------------------------------------

def q_doc_sample(sf_dir: str):
    """Deterministic stratified sample of the documents table: English docs
    kept at 5%, everything else at 20% (up-sampling the rare strata — the
    standard training-data-mix move). Pure integer hash decision per row
    (``relational.hash_sample``), so the driver oracle reproduces the exact
    keep-set; no shuffle, no RNG."""
    docs = _rp(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    return rel.hash_sample(docs, "doc_id", 200, strata_col="lang",
                           strata_permille={"en": 50})


SQL_DOC_SAMPLE = """
-- mask to 32 bits BEFORE the multiply (mirrors relational.hash_sample):
-- exact over the full int64 id domain; HUGEINT keeps the product exact
SELECT doc_id, lang, n_chars
FROM documents
WHERE (CAST(doc_id & 4294967295 AS HUGEINT) * 2654435761) % 4294967296 % 1000
      < CASE WHEN lang = 'en' THEN 50 ELSE 200 END
"""


def q_doc_cap_per_source(sf_dir: str):
    """Per-domain cap — the training-data-mix pass that keeps at most N docs
    per source, chosen DETERMINISTICALLY (by Knuth-multiplicative hash of
    doc_id, ties by doc_id) so every re-run and the SQL oracle select the
    identical set. Routed through ``relational.group_topk`` (bucketed
    partial-top-k — high-source-cardinality safe, no map_groups)."""
    docs = _rp(sf_dir, "documents", ["doc_id", "source"])

    def _hv(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # 32-bit mask before multiply: product fits uint64 exactly, matching
        # the oracle's HUGEINT arithmetic over the full int64 id domain
        masked = (ids & np.int64(0xFFFFFFFF)).astype(np.uint64)
        hv = ((masked * np.uint64(2654435761)) % np.uint64(1 << 32)).astype(np.int64)
        return pa.table({"source": batch["source"], "doc_id": batch["doc_id"],
                         "hv": hv})

    hashed = docs.map_batches(_hv, batch_format="pyarrow", batch_size=8192)
    capped = rel.group_topk(hashed, ["source"], [("hv", True), ("doc_id", True)],
                            50, rank_col="rk", est_rows=_nrows(sf_dir, "documents"))
    return capped.select_columns(["source", "doc_id", "rk"])


SQL_DOC_CAP_PER_SOURCE = """
SELECT source, doc_id, rk FROM (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY (CAST(doc_id & 4294967295 AS HUGEINT) * 2654435761)
                    % 4294967296, doc_id) AS rk
  FROM documents
) WHERE rk <= 50
"""


def q_doc_vocab(sf_dir: str):
    """Global top-50 token vocabulary over the corpus (vocabulary-building
    pass; see ``textops.vocab_topk``) — partial counts per batch, token-hash
    bucketed combine, deterministic (n desc, token asc) tie-break."""
    docs = _rp(sf_dir, "documents", ["text"])
    return textops.vocab_topk(docs, k=50, est_rows=_nrows(sf_dir, "documents"))


SQL_DOC_VOCAB = r"""
WITH tok AS (
  SELECT unnest(regexp_extract_all(lower(text), '\w+')) AS token FROM documents
),
c AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY 1)
SELECT token, n FROM c ORDER BY n DESC, token LIMIT 50
"""


def q_doc_token_stats(sf_dir: str):
    return textops.token_stats(_rp(sf_dir, "documents", ["doc_id", "text"]))


SQL_DOC_TOKEN_STATS = r"""
SELECT doc_id,
       CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
"""


def q_doc_quality(sf_dir: str):
    return textops.quality_scores(_rp(sf_dir, "documents", ["doc_id", "text"]))


SQL_DOC_QUALITY = """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
         / GREATEST(length(text), 1) AS alpha_ratio,
       CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
         / GREATEST(length(text), 1) AS digit_ratio
FROM documents
"""


def q_doc_repetition(sf_dir: str):
    """Gopher-style in-document repetition metrics (duplicate-word fraction,
    most-repeated word / word-bigram counts) — the repetition-quality filter
    of a training-data pipeline (`textops.repetition_stats`)."""
    return textops.repetition_stats(_rp(sf_dir, "documents", ["doc_id", "text"]))


SQL_DOC_REPETITION = r"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ws FROM documents
), base AS (
  SELECT doc_id,
         CAST(len(ws) AS BIGINT) AS n_words,
         CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct_words
  FROM w
), wcount AS (
  SELECT doc_id, wd, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(ws) AS wd FROM w) GROUP BY doc_id, wd
), tw AS (
  SELECT doc_id, MAX(c) AS top_word_n FROM wcount GROUP BY doc_id
), bigrams AS (
  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
  FROM (SELECT doc_id, unnest(range(1, len(ws))) AS i, ws
        FROM w WHERE len(ws) >= 2)
), bcount AS (
  SELECT doc_id, w1, w2, COUNT(*) AS c FROM bigrams GROUP BY doc_id, w1, w2
), tb AS (
  SELECT doc_id, MAX(c) AS top_bigram_n FROM bcount GROUP BY doc_id
)
SELECT b.doc_id, b.n_words, b.n_distinct_words,
       CAST(b.n_words - b.n_distinct_words AS DOUBLE)
         / GREATEST(b.n_words, 1) AS dup_word_ratio,
       CAST(COALESCE(tw.top_word_n, 0) AS BIGINT) AS top_word_n,
       CAST(COALESCE(tb.top_bigram_n, 0) AS BIGINT) AS top_bigram_n,
       CAST(COALESCE(tb.top_bigram_n, 0) AS DOUBLE)
         / GREATEST(b.n_words - 1, 1) AS top_bigram_ratio
FROM base b LEFT JOIN tw USING (doc_id) LEFT JOIN tb USING (doc_id)
"""


def q_doc_exact_dedup(sf_dir: str):
    docs = _rp(sf_dir, "documents", ["doc_id", "text"])
    hashed = textops.content_hash(docs).select_columns(["doc_id", "text_hash"])
    return dedup.exact_dedup_groups(hashed, "text_hash", "doc_id")


SQL_DOC_EXACT_DEDUP = """
SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_doc_id, COUNT(*) AS dup_count
FROM documents GROUP BY 1
"""


def q_doc_normalized_dedup(sf_dir: str):
    """Normalization-insensitive dedup (``dedup.normalized_dedup_groups``):
    byte-different docs that agree after ASCII case-fold + punct/whitespace
    collapse dedup into one group — the corpus-cleaning pass between exact
    and MinHash dedup. The corpus has no such copies, so deterministic
    re-punctuated copies are planted map-side for every doc_id % 97 == 0
    (id + 10,000,000; noise is pure non-alphanumerics so the planted copy
    normalizes EQUAL without any cross-engine case-mapping risk)."""

    docs = _rp(sf_dir, "documents", ["doc_id", "text"])

    def _plant(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = np.flatnonzero(ids % 97 == 0)
        if len(sel) == 0:
            return batch
        texts = batch["text"].to_pylist()
        dup = pa.table({
            "doc_id": ids[sel] + 10_000_000,
            "text": pa.array(["  " + texts[i] + "  !!??  " for i in sel],
                             type=pa.string()),
        })
        return pa.concat_tables([batch.select(["doc_id", "text"]), dup])

    planted = docs.map_batches(_plant, batch_format="pyarrow", batch_size=4096)
    return dedup.normalized_dedup_groups(planted)


SQL_DOC_NORMALIZED_DEDUP = """
WITH docs2 AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000, '  ' || text || '  !!??  '
  FROM documents WHERE doc_id % 97 = 0
),
n AS (
  SELECT doc_id,
         trim(regexp_replace(
           translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                           'abcdefghijklmnopqrstuvwxyz'),
           '[^a-z0-9]+', ' ', 'g')) AS norm
  FROM docs2
)
SELECT MIN(doc_id) AS keep_doc_id, CAST(COUNT(*) AS BIGINT) AS n_dups,
       CAST(length(norm) AS BIGINT) AS n_norm_chars
FROM n GROUP BY norm HAVING COUNT(*) >= 2
"""


def q_doc_pii_scan(sf_dir: str):
    """PII-shaped token scan (``textops.pii_scan``): per doc, counts of
    email-shaped tokens ('@' then '.') and phone-shaped tokens (≥7-digit
    run) — the redaction/filter pass of a training-data pipeline. The
    corpus is PII-free, so a deterministic PII-bearing suffix is planted
    for every doc_id % 97 == 0 (same planting rule as the dedup siblings;
    the oracle mirrors it as string concat)."""
    docs = _rp(sf_dir, "documents", ["doc_id", "text"])

    def _plant(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch["text"].to_pylist()
        out = [t + " contact bob@example.com or call 5551234567 now"
               if ids[i] % 97 == 0 else t for i, t in enumerate(texts)]
        return pa.table({"doc_id": ids,
                         "text": pa.array(out, type=pa.string())})

    planted = docs.map_batches(_plant, batch_format="pyarrow", batch_size=4096)
    return textops.pii_scan(planted)


SQL_DOC_PII_SCAN = r"""
WITH docs2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 97 = 0
              THEN text || ' contact bob@example.com or call 5551234567 now'
              ELSE text END AS text
  FROM documents
),
t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
  FROM docs2
)
SELECT doc_id,
       CAST(len(list_filter(toks, t -> strpos(t, '@') > 0
              AND strpos(substr(t, strpos(t, '@') + 1), '.') > 0)) AS BIGINT)
         AS n_emails,
       CAST(len(list_filter(toks, t -> regexp_matches(t, '[0-9]{7}')))
         AS BIGINT) AS n_digit_tokens,
       (len(list_filter(toks, t -> strpos(t, '@') > 0
              AND strpos(substr(t, strpos(t, '@') + 1), '.') > 0))
        + len(list_filter(toks, t -> regexp_matches(t, '[0-9]{7}')))) > 0
         AS has_pii
FROM t
"""


def q_doc_heavy_hitters(sf_dir: str):
    """Frequent word-bigrams via Misra-Gries sketch + exact verify
    (``textops.heavy_hitters``): the two-pass sketch-then-verify pattern —
    pass 1 never shuffles exact counts (per-batch MG-compressed summaries;
    pigeonhole-superset guarantee), pass 2 exact-counts only the broadcast
    candidates. Output = exactly the bigrams with n·(k+1) > N, k = 1200 —
    the same rows the plain SQL HAVING produces."""
    docs = _rp(sf_dir, "documents", ["text"])
    return textops.heavy_hitters(docs, k=1200)


SQL_DOC_HEAVY_HITTERS = r"""
WITH w AS (
  SELECT regexp_extract_all(lower(text), '\w+') AS ws FROM documents
),
bg AS (
  SELECT ws[i] || ' ' || ws[i + 1] AS bigram
  FROM (SELECT unnest(range(1, len(ws))) AS i, ws FROM w WHERE len(ws) >= 2)
)
SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
FROM bg GROUP BY bigram
HAVING COUNT(*) * 1201 > (SELECT COUNT(*) FROM bg)
"""


def q_doc_lm_score(sf_dir: str):
    """Corpus-bigram-LM document scoring (``textops.bigram_lm_score``) —
    the perplexity-filter shape: train global bigram counts (vocabulary-
    bounded shuffle), broadcast the model, score every doc map-side with
    exact integer (n_bigrams, Σ count, min count) over its bigrams'
    GLOBAL frequencies."""
    docs = _rp(sf_dir, "documents", ["doc_id", "text"])
    return textops.bigram_lm_score(docs)


SQL_DOC_LM_SCORE = r"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ws FROM documents
),
bg AS (
  SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS b
  FROM (SELECT doc_id, unnest(range(1, len(ws))) AS i, ws
        FROM w WHERE len(ws) >= 2)
),
c AS (SELECT b, COUNT(*) AS n FROM bg GROUP BY b)
SELECT bg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(c.n) AS BIGINT) AS sum_bigram_n,
       CAST(MIN(c.n) AS BIGINT) AS min_bigram_n
FROM bg JOIN c USING (b) GROUP BY bg.doc_id
"""


def q_user_retention_cohorts(sf_dir: str):
    """Cohort retention analysis: users cohorted by first-active week;
    (cohort_week, week_offset) → distinct active users. One user-bucketed
    grouped pass computes each user's cohort AND its distinct week offsets
    (≤ 1 row per (user, offset)), then a pair-keyed combiner sums users —
    the shuffle never carries more than distinct (user, week) rows."""
    from ..stages.relational import bucketed_groups, partial_groupby_sum

    ev = _rp(sf_dir, "events", ["user_id", "ts"])

    def _days(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"].cast(pa.int64()),
            "day": pc.floor(pc.divide(batch["ts"].cast(pa.int64()),
                                      86_400_000_000)).cast(pa.int64()),
        })

    days = ev.map_batches(_days, batch_format="pyarrow", batch_size=8192)

    def _pre(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["user_id", "day"])

    def _per_user(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["user_id", "day"]).sort_values(["user_id", "day"])
        uid = d["user_id"].to_numpy()
        day = d["day"].to_numpy().astype(np.int64)
        new = np.r_[True, uid[1:] != uid[:-1]]
        cohort = day[np.flatnonzero(new)]
        cohort_full = np.repeat(cohort, np.diff(np.r_[np.flatnonzero(new), len(d)]))
        off = (day - cohort_full) // 7
        out = pd.DataFrame({"cohort_week": cohort_full // 7,
                            "week_offset": off, "user_id": uid})
        out = out.drop_duplicates()
        return out.assign(n_users=np.int64(1))[
            ["cohort_week", "week_offset", "n_users"]]

    per_user = bucketed_groups(days, ["user_id"], _per_user, pre_fn=_pre)
    return partial_groupby_sum(per_user, ["cohort_week", "week_offset"],
                               ["n_users"])


SQL_USER_RETENTION_COHORTS = """
WITH d AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
  FROM events
),
c AS (SELECT user_id, MIN(day) AS cohort FROM d GROUP BY user_id)
SELECT c.cohort // 7 AS cohort_week, (d.day - c.cohort) // 7 AS week_offset,
       CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS n_users
FROM d JOIN c USING (user_id) GROUP BY 1, 2
"""


def q_events_window_topk(sf_dir: str):
    """Windowed heavy hitters: per tumbling hour, the top-3 event types by
    count (ties → type asc) — counts pre-aggregate per batch (window×type-
    alphabet-bounded shuffle), then the bucketed partial-top-k."""
    from ..stages.relational import group_topk, partial_groupby_sum

    ev = _rp(sf_dir, "events", ["ts", "event_type"])

    def _w(batch: pa.Table) -> pa.Table:
        return pa.table({
            "hour": pc.floor(pc.divide(batch["ts"].cast(pa.int64()),
                                       3_600_000_000)).cast(pa.int64()),
            "event_type": batch["event_type"],
        })

    w = ev.map_batches(_w, batch_format="pyarrow", batch_size=8192)
    counts = partial_groupby_sum(
        w.map_batches(lambda t: t.append_column("n", pa.array(
            np.ones(len(t), np.int64))), batch_format="pyarrow"),
        ["hour", "event_type"], ["n"])
    return group_topk(counts, ["hour"], [("n", False), ("event_type", True)],
                      3, rank_col="rk")


SQL_EVENTS_WINDOW_TOPK = """
WITH c AS (
  SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour, event_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT hour, event_type, n, rk FROM (
  SELECT hour, event_type, n,
         ROW_NUMBER() OVER (PARTITION BY hour
                            ORDER BY n DESC, event_type) AS rk
  FROM c
) WHERE rk <= 3
"""


def q_supplier_cooccurrence(sf_dir: str):
    """Co-occurrence self-join (the wedge-enumeration step of triangle
    counting / co-purchase analysis): supplier pairs sharing ≥ 30 distinct
    parts. Pairs are generated INSIDE part-keyed groups (each part emits
    its C(s,2) wedges — the documented quadratic-in-degree step; real
    deployments cap hot keys, here part degrees are bounded by the data),
    then a pair-keyed combiner sums shared-part counts."""
    from ..stages.relational import bucketed_groups, partial_groupby_sum

    li = _rp(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def _pre(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["l_partkey", "l_suppkey"])

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = (g.drop_duplicates(["l_partkey", "l_suppkey"])
             .sort_values(["l_partkey", "l_suppkey"]))
        pk = d["l_partkey"].to_numpy()
        sk = d["l_suppkey"].to_numpy().astype(np.int64)
        starts = np.flatnonzero(np.r_[True, pk[1:] != pk[:-1]])
        sizes = np.diff(np.r_[starts, len(d)])
        a_out, b_out = [], []
        # vectorize over SIZE CLASSES: all parts with m suppliers emit their
        # C(m,2) wedges in one fancy-index (the loop is over distinct group
        # sizes — dozens — never over the tens of thousands of parts)
        for m in np.unique(sizes):
            if m < 2:
                continue
            grp_starts = starts[sizes == m]
            idx = grp_starts[:, None] + np.arange(m)[None, :]
            mat = sk[idx]                       # (n_groups, m)
            ii, jj = np.triu_indices(int(m), k=1)
            a_out.append(mat[:, ii].ravel())
            b_out.append(mat[:, jj].ravel())
        if not a_out:
            return pd.DataFrame({"supp_a": np.array([], np.int64),
                                 "supp_b": np.array([], np.int64),
                                 "n_shared": np.array([], np.int64)})
        out = pd.DataFrame({"supp_a": np.concatenate(a_out),
                            "supp_b": np.concatenate(b_out)})
        # combiner: collapse this bucket's wedges to pair counts before the
        # pair shuffle (the wedge set is the quadratic part — never ship it)
        out = out.groupby(["supp_a", "supp_b"], as_index=False, sort=False)
        out = out.size().rename(columns={"size": "n_shared"})
        out["n_shared"] = out["n_shared"].astype(np.int64)
        return out

    wedges = bucketed_groups(li, ["l_partkey"], _pairs, pre_fn=_pre)
    summed = partial_groupby_sum(wedges, ["supp_a", "supp_b"], ["n_shared"])

    def _thr(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["n_shared"], 30))

    return summed.map_batches(_thr, batch_format="pyarrow")


_SQL_COOC_EDGES = """
ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
e AS (
  SELECT a.l_suppkey AS supp_a, b.l_suppkey AS supp_b,
         CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM ps a JOIN ps b
    ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 30
)"""

SQL_SUPPLIER_COOCCURRENCE = ("WITH " + _SQL_COOC_EDGES
                             + "\nSELECT supp_a, supp_b, n_shared FROM e")


def q_supplier_triangles(sf_dir: str):
    """Per-node triangle counts over the thresholded co-occurrence graph
    (``graphrank.triangle_counts``): the degree-ordered orientation finds
    each triangle a<b<c exactly once at its lowest edge via a sorted-
    adjacency intersection; the bounded edge table broadcasts as CSR and
    the edge stream probes it batch-parallel."""
    from ..stages.graphrank import triangle_counts

    return triangle_counts(q_supplier_cooccurrence(sf_dir))


SQL_SUPPLIER_TRIANGLES = ("WITH " + _SQL_COOC_EDGES + """,
tri AS (
  SELECT e1.supp_a AS a, e1.supp_b AS b, e2.supp_b AS c
  FROM e e1
  JOIN e e2 ON e2.supp_a = e1.supp_a AND e2.supp_b > e1.supp_b
  JOIN e e3 ON e3.supp_a = e1.supp_b AND e3.supp_b = e2.supp_b
),
nodes AS (
  SELECT a AS supp FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT supp, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM nodes GROUP BY supp
""")


def q_events_ewma(sf_dir: str):
    """Per-user integer-floor EWMA over the event-value stream
    (``windows.ewma_by_key``; α = 1/4 as the rational 3/4-carry) — the
    stateful sequential recurrence of a streaming metrics pipeline, with a
    recursive-CTE oracle that replays the exact same floor steps."""
    from ..stages.windows import ewma_by_key

    ev = _rp(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def _pre(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"].cast(pa.int64()),
            "ts": batch["ts"].cast(pa.int64()),
            "event_id": batch["event_id"].cast(pa.int64()),
            "v": pa.array(cents(batch["value"].to_numpy(zero_copy_only=False))),
        })

    prep = ev.map_batches(_pre, batch_format="pyarrow", batch_size=8192)
    return ewma_by_key(prep, "user_id", ["ts", "event_id"], "v")


SQL_EVENTS_EWMA = """
WITH RECURSIVE ev AS MATERIALIZED (
  SELECT user_id, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS BIGINT) AS rn
  FROM events
),
nn AS (SELECT user_id, MAX(rn) AS n FROM ev GROUP BY user_id),
r AS (
  SELECT user_id, rn, v AS a, v AS amax FROM ev WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.rn, (3 * r.a + e.v) // 4,
         GREATEST(r.amax, (3 * r.a + e.v) // 4)
  FROM r JOIN ev e ON e.user_id = r.user_id AND e.rn = r.rn + 1
)
SELECT r.user_id, nn.n AS n_events, r.a AS ewma_final_c,
       r.amax AS ewma_max_c
FROM r JOIN nn ON nn.user_id = r.user_id AND r.rn = nn.n
"""


def q_tile_coverage_grid(sf_dir: str):
    """Raster-style coverage rollup (raster↔vector assignment half of the
    north star): the tile-rect layer rasterized onto a 32×32 coarse grid —
    per cell, the total CLIPPED intersection area and contributing-tile
    count. Each tile expands map-side to only the few cells it overlaps
    (integer div on its bounds), areas are exact int64 products, and the
    shuffle is grid-sized (≤1024 rows per batch after the per-batch
    combiner)."""
    from ..stages.relational import partial_groupby_sum

    CELL = 2048
    part = _rp(sf_dir, "part", ["p_partkey", "p_size"])

    def _expand(batch: pa.Table) -> pa.Table:
        t = td.tiles_batch(batch)
        cx = t["cx"].to_numpy()
        cy = t["cy"].to_numpy()
        hw = t["hw"].to_numpy()
        hh = t["hh"].to_numpy()
        x0, x1 = cx - hw, cx + hw
        y0, y1 = cy - hh, cy + hh
        # in-world clip (rects can straddle the modular world edge)
        x0c, x1c = np.maximum(x0, 0), np.minimum(x1, 65536)
        y0c, y1c = np.maximum(y0, 0), np.minimum(y1, 65536)
        keep = (x1c > x0c) & (y1c > y0c)
        x0c, x1c, y0c, y1c = x0c[keep], x1c[keep], y0c[keep], y1c[keep]
        gx0, gx1 = x0c // CELL, (x1c - 1) // CELL
        gy0, gy1 = y0c // CELL, (y1c - 1) // CELL
        nx = (gx1 - gx0 + 1).astype(np.int64)
        ny = (gy1 - gy0 + 1).astype(np.int64)
        reps = nx * ny
        ti = np.repeat(np.arange(len(x0c)), reps)
        # per-tile local cell offsets (vectorized ragged expansion)
        off = np.arange(reps.sum()) - np.repeat(np.cumsum(reps) - reps, reps)
        cxg = gx0[ti] + off % nx[ti]
        cyg = gy0[ti] + off // nx[ti]
        cl, cr = cxg * CELL, (cxg + 1) * CELL
        cb, ct = cyg * CELL, (cyg + 1) * CELL
        iw = np.minimum(x1c[ti], cr) - np.maximum(x0c[ti], cl)
        ih = np.minimum(y1c[ti], ct) - np.maximum(y0c[ti], cb)
        pos = (iw > 0) & (ih > 0)
        df = pd.DataFrame({"cell_x": cxg[pos], "cell_y": cyg[pos],
                           "area": (iw * ih)[pos],
                           "n_tiles": np.int64(1)})
        agg = df.groupby(["cell_x", "cell_y"], as_index=False, sort=False).sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    partials = part.map_batches(_expand, batch_format="pyarrow",
                                batch_size=8192)
    return partial_groupby_sum(partials, ["cell_x", "cell_y"],
                               ["area", "n_tiles"])


SQL_TILE_COVERAGE_GRID = f"""
WITH tiles AS ({td.TILES_SQL}),
rects AS (
  SELECT GREATEST(cx - hw, 0) AS x0, LEAST(cx + hw, 65536) AS x1,
         GREATEST(cy - hh, 0) AS y0, LEAST(cy + hh, 65536) AS y1
  FROM tiles
),
cells AS (
  SELECT gx.g AS cell_x, gy.g AS cell_y,
         gx.g * 2048 AS cl, (gx.g + 1) * 2048 AS cr,
         gy.g * 2048 AS cb, (gy.g + 1) * 2048 AS ct
  FROM (SELECT unnest(range(32)) AS g) gx,
       (SELECT unnest(range(32)) AS g) gy
)
SELECT c.cell_x, c.cell_y,
       CAST(SUM((LEAST(r.x1, c.cr) - GREATEST(r.x0, c.cl))
              * (LEAST(r.y1, c.ct) - GREATEST(r.y0, c.cb))) AS BIGINT) AS area,
       CAST(COUNT(*) AS BIGINT) AS n_tiles
FROM rects r JOIN cells c
  ON r.x0 < c.cr AND r.x1 > c.cl AND r.y0 < c.ct AND r.y1 > c.cb
WHERE r.x1 > r.x0 AND r.y1 > r.y0
GROUP BY c.cell_x, c.cell_y
"""


def q_tile_knn_graph(sf_dir: str):
    """Tile self-kNN graph (every 10th tile → its 4 nearest tile centroids,
    deterministic (dist², tile_id) order incl. self) — the kNN-graph
    construction step of a spatial index / mesh builder, reusing the
    broadcast-index ``spatial.knn_join`` exactly as the customer-probe kNN
    does. The probe side is the decimated tile set so the brute-force
    cross-join oracle stays tractable."""
    from ..stages.spatial import knn_join

    part = _rp(sf_dir, "part", ["p_partkey", "p_size"])

    def _probes(batch: pa.Table) -> pa.Table:
        t = td.tiles_batch(batch)
        keep = pa.array(t["tile_id"].to_numpy() % 10 == 0)
        t = t.filter(keep)
        return pa.table({"src_tile": t["tile_id"], "px": t["cx"],
                         "py": t["cy"]})

    probes = part.map_batches(_probes, batch_format="pyarrow",
                              batch_size=32768)
    out = knn_join(probes, conflation.tiles_ref(sf_dir), k=4,
                   x_col="px", y_col="py", carry_cols=["src_tile"])
    return out.select_columns(["src_tile", "tile_id", "knn_rank", "dist2"])


SQL_TILE_KNN_GRAPH = f"""
WITH tiles AS ({td.TILES_SQL}),
probes AS (SELECT tile_id AS src_tile, cx AS px, cy AS py
           FROM tiles WHERE tile_id % 10 = 0)
SELECT src_tile, tile_id, knn_rank, dist2 FROM (
  SELECT p.src_tile, t.tile_id,
         ROW_NUMBER() OVER (
           PARTITION BY p.src_tile
           ORDER BY (p.px - t.cx) * (p.px - t.cx)
                  + (p.py - t.cy) * (p.py - t.cy), t.tile_id) AS knn_rank,
         (p.px - t.cx) * (p.px - t.cx)
           + (p.py - t.cy) * (p.py - t.cy) AS dist2
  FROM probes p CROSS JOIN tiles t
) WHERE knn_rank <= 4
"""


def q_orders_skyline(sf_dir: str):
    """Distributed skyline (Pareto frontier): orders not dominated on
    (maximize price, minimize date). Local skylines per batch, then the
    exact skyline of their union — correct because a globally non-dominated
    point is non-dominated in its own batch, so skyline(∪ local skylines)
    = skyline(all); local skylines are O(log batch) rows, so the final
    pass materializes a provably tiny union. The keep rule (shared by both
    passes and the SQL sweep oracle): keep i iff no j has (pⱼ > pᵢ and
    dⱼ ≤ dᵢ) and no j has (pⱼ = pᵢ and dⱼ < dᵢ)."""
    orders = _rp(sf_dir, "orders",
                 ["o_orderkey", "o_totalprice", "o_orderdate"])

    def _local_skyline(df: pd.DataFrame) -> pd.DataFrame:
        p = df["price_c"].to_numpy()
        d = df["date_us"].to_numpy()
        o = np.lexsort((d, -p))  # price desc, date asc
        ps, ds = p[o], d[o]
        # strict-greater-price running min of date
        new_p = np.r_[True, ps[1:] != ps[:-1]]
        grp = np.cumsum(new_p) - 1
        mind_per_p = np.minimum.reduceat(ds, np.flatnonzero(new_p))
        run = np.minimum.accumulate(mind_per_p)
        mind_gt = np.r_[np.int64(np.iinfo(np.int64).max), run[:-1]][grp]
        keep = (ds < mind_gt) & (ds == mind_per_p[grp])
        return df.iloc[o[keep]]

    def _pre(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "o_orderkey": batch["o_orderkey"].cast(pa.int64()),
            "price_c": pa.array(cents(
                batch["o_totalprice"].to_numpy(zero_copy_only=False))),
            "date_us": batch["o_orderdate"].cast(pa.int64()),
        })
        return pa.Table.from_pandas(_local_skyline(t.to_pandas()),
                                    preserve_index=False)

    local = orders.map_batches(_pre, batch_format="pyarrow", batch_size=8192)
    union = local.to_pandas()  # bounded: sum of O(log batch) local skylines
    final = _local_skyline(union).sort_values("o_orderkey")
    return pa.Table.from_pandas(final.reset_index(drop=True),
                                preserve_index=False)


SQL_ORDERS_SKYLINE = """
WITH o AS (
  SELECT o_orderkey, CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c,
         CAST(epoch_us(o_orderdate) AS BIGINT) AS date_us
  FROM orders
),
m1 AS (SELECT price_c, MIN(date_us) AS mind FROM o GROUP BY price_c),
mg AS (
  SELECT price_c, mind,
         MIN(mind) OVER (ORDER BY price_c DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS mind_gt
  FROM m1
)
SELECT o.o_orderkey, o.price_c, o.date_us
FROM o JOIN mg USING (price_c)
WHERE o.date_us = mg.mind
  AND (mg.mind_gt IS NULL OR o.date_us < mg.mind_gt)
"""


def q_lineitem_profile(sf_dir: str):
    """Data-profiling pass (the schema-quality check every ingest pipeline
    runs first): per numeric column, exact (n_rows, n_nulls, min, max) with
    money columns quantized to cents — one combiner row per column per
    batch, so the shuffle is column-count-sized."""
    from ..stages.relational import bucketed_groups

    li = _rp(sf_dir, "lineitem",
             ["l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
              "l_discount", "l_tax"])
    cents_cols = {"l_quantity", "l_extendedprice", "l_discount", "l_tax"}

    def _prof(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in df.columns:
            v = df[c]
            nn = int(v.isna().sum())
            x = v.dropna().to_numpy()
            if c in cents_cols:
                x = cents(x.astype(np.float64))
            else:
                x = x.astype(np.int64)
            rows.append({"col": c, "n_rows": np.int64(len(v)),
                         "n_nulls": np.int64(nn),
                         "min_v": np.int64(x.min()) if len(x) else np.int64(0),
                         "max_v": np.int64(x.max()) if len(x) else np.int64(0)})
        return pd.DataFrame(rows)

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("col", as_index=False, sort=False).agg(
            n_rows=("n_rows", "sum"), n_nulls=("n_nulls", "sum"),
            min_v=("min_v", "min"), max_v=("max_v", "max"))

    return bucketed_groups(li, ["col"], _final, pre_fn=_prof, n_buckets=4)


SQL_LINEITEM_PROFILE = """
SELECT 'l_orderkey' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT(l_orderkey) AS BIGINT) AS n_nulls,
       MIN(l_orderkey) AS min_v, MAX(l_orderkey) AS max_v FROM lineitem
UNION ALL
SELECT 'l_partkey', COUNT(*), COUNT(*) - COUNT(l_partkey),
       MIN(l_partkey), MAX(l_partkey) FROM lineitem
UNION ALL
SELECT 'l_quantity', COUNT(*), COUNT(*) - COUNT(l_quantity),
       MIN(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)),
       MAX(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) FROM lineitem
UNION ALL
SELECT 'l_extendedprice', COUNT(*), COUNT(*) - COUNT(l_extendedprice),
       MIN(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)),
       MAX(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) FROM lineitem
UNION ALL
SELECT 'l_discount', COUNT(*), COUNT(*) - COUNT(l_discount),
       MIN(CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)),
       MAX(CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)) FROM lineitem
UNION ALL
SELECT 'l_tax', COUNT(*), COUNT(*) - COUNT(l_tax),
       MIN(CAST(FLOOR(l_tax * 100 + 0.5) AS BIGINT)),
       MAX(CAST(FLOOR(l_tax * 100 + 0.5) AS BIGINT)) FROM lineitem
"""


def q_doc_langid(sf_dir: str):
    """Heuristic language ID (stopword-profile argmax + CJK share) — the
    same rule expressed as the DuckDB oracle below (profiles inlined as a
    VALUES list; RE2 ``[\\p{L}\\p{N}_]+`` ≡ the kernel's ``\\w``)."""
    return textops.lang_id(_rp(sf_dir, "documents", ["doc_id", "text"]))


def _langid_profile_values() -> str:
    from ..functions.text import _LANG_PROFILES

    return ",".join(
        f"('{lang}','{w}')"
        for lang in sorted(_LANG_PROFILES)
        for w in sorted(_LANG_PROFILES[lang])
    )


SQL_DOC_LANGID = r"""
WITH w AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[\p{L}\p{N}_]+')) AS wd
  FROM documents
),
prof(lang, wd) AS (VALUES __PROFILES__),
nw AS (SELECT doc_id, COUNT(*) AS n FROM w GROUP BY 1),
hits AS (SELECT w.doc_id, p.lang, COUNT(*) AS h FROM w JOIN prof p ON w.wd = p.wd GROUP BY 1, 2),
best AS (
  SELECT nw.doc_id, h.lang,
         ROW_NUMBER() OVER (
           PARTITION BY nw.doc_id ORDER BY CAST(h.h AS DOUBLE) / nw.n DESC, h.lang
         ) AS rn
  FROM nw JOIN hits h USING (doc_id) WHERE h.h > 0
),
cjk AS (
  SELECT doc_id,
         CASE WHEN length(text) > 0 AND
              CAST(length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS DOUBLE)
                / length(text) > 0.2
         THEN 1 ELSE 0 END AS is_cjk
  FROM documents
)
SELECT d.doc_id,
       CASE WHEN cjk.is_cjk = 1 THEN 'zh' ELSE COALESCE(b.lang, 'und') END AS lang_pred
FROM documents d JOIN cjk USING (doc_id)
LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
"""


def q_doc_fingerprint(sf_dir: str):
    return textops.fingerprints(_rp(sf_dir, "documents", ["doc_id", "text"]))


def q_doc_simhash(sf_dir: str):
    return dedup.simhash(_rp(sf_dir, "documents", ["doc_id", "text"]))


def q_doc_minhash_pairs(sf_dir: str):
    docs = _rp(sf_dir, "documents", ["doc_id", "text"])
    sigs = dedup.minhash_signatures(docs)
    return dedup.lsh_candidate_pairs(sigs)


# FNV-1a64 of a string expression, in pure SQL: fold over code points with
# HUGEINT arithmetic mod 2^64 — bit-identical to ``functions.text.fnv1a64``
# for ASCII input (code point == utf-8 byte; the synthetic corpus is ASCII).
# ``{s}`` is the string expression; the comprehension variable is ``_ci`` so
# callers can safely use ``i`` in ``{s}``.
def _sql_fnv(s: str) -> str:
    return f"""
list_reduce(
    list_prepend(CAST(14695981039346656037 AS HUGEINT),
      [CAST(unicode(substr({s}, CAST(_ci AS INT), 1)) AS HUGEINT)
       FOR _ci IN range(1, length({s})+1)]),
    (h, c) -> (xor(h, c) * 1099511628211) % 18446744073709551616)
"""


# uint64 (carried as HUGEINT/UBIGINT) -> int64 two's-complement reinterpret,
# matching numpy's ``.view(np.int64)``
def _sql_u64_to_i64(v: str) -> str:
    return (f"CAST(CASE WHEN {v} >= 9223372036854775808 "
            f"THEN CAST({v} AS HUGEINT) - 18446744073709551616 "
            f"ELSE CAST({v} AS HUGEINT) END AS BIGINT)")


SQL_DOC_SIMHASH = f"""
WITH words AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[0-9a-z_]+')) AS w
  FROM documents
),
wh AS (SELECT doc_id, {_sql_fnv('w')} AS h FROM words),
bits AS (
  SELECT doc_id, b.bit,
         SUM(CASE WHEN (h >> CAST(b.bit AS INT)) % 2 = 1 THEN 1 ELSE -1 END) AS vote
  FROM wh, (SELECT unnest(range(64)) AS bit) b
  GROUP BY doc_id, b.bit
),
sh AS (
  SELECT doc_id,
         SUM(CASE WHEN vote > 0 THEN (CAST(1 AS HUGEINT) << CAST(bit AS INT))
                  ELSE 0 END) AS sim_u
  FROM bits GROUP BY doc_id
)
SELECT d.doc_id, {_sql_u64_to_i64('COALESCE(s.sim_u, 0)')} AS simhash
FROM documents d LEFT JOIN sh s USING (doc_id)
"""


SQL_DOC_FINGERPRINT = f"""
WITH lt AS (SELECT doc_id, lower(text) AS s FROM documents),
grams AS (
  SELECT doc_id, CAST(i AS BIGINT) AS gi,
         CAST({_sql_fnv("substr(s, CAST(i AS INT), 5)")} AS UBIGINT) AS h
  FROM lt, LATERAL (SELECT unnest(range(1, length(s) - 3)) AS i)
  WHERE length(s) >= 5
),
ng AS (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id),
wins AS (
  SELECT g.doc_id,
         MIN(g.h) OVER (PARTITION BY g.doc_id ORDER BY g.gi
                        ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS wmin,
         g.gi, n.n_grams
  FROM grams g JOIN ng n USING (doc_id)
),
sel AS (
  SELECT DISTINCT doc_id, wmin FROM wins WHERE n_grams <= 8 AND gi = 1
  UNION
  SELECT DISTINCT doc_id, wmin FROM wins WHERE n_grams > 8 AND gi <= n_grams - 7
),
selc AS (SELECT doc_id, COUNT(*) AS cnt FROM sel GROUP BY doc_id),
folded AS (
  SELECT s.doc_id,
         bit_xor(CAST((CAST(s.wmin AS HUGEINT) * 1099511628211 + c.cnt)
                      % 18446744073709551616 AS UBIGINT)) AS fp_u
  FROM sel s JOIN selc c USING (doc_id) GROUP BY s.doc_id
),
short AS (
  SELECT doc_id, CAST({_sql_fnv('s')} AS UBIGINT) AS fp_u
  FROM lt WHERE length(s) < 5
),
allfp AS (SELECT * FROM folded UNION ALL SELECT * FROM short)
SELECT d.doc_id, {_sql_u64_to_i64('a.fp_u')} AS fp
FROM documents d JOIN allfp a USING (doc_id)
"""


# MinHash signatures + banded LSH, in SQL: same shingling, the closed-form
# (a, b) permutation params of ``functions.text.minhash_params`` (seed 42),
# and the per-band FNV fold of ``stages.dedup.lsh_candidate_pairs``
_SQL_MINHASH_CTES = f"""
WITH ws AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[0-9a-z_]+') AS w FROM documents
),
shstr AS (
  SELECT doc_id,
         CASE WHEN len(w) = 0 THEN []
              WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
              ELSE [w[_si] || ' ' || w[_si+1] || ' ' || w[_si+2]
                    FOR _si IN range(1, len(w) - 1)]
         END AS shingles
  FROM ws
),
shx AS (
  SELECT DISTINCT doc_id,
         CAST({_sql_fnv('sh')} % 4294967296 AS BIGINT) AS x
  FROM (SELECT doc_id, unnest(shingles) AS sh FROM shstr)
),
perms AS (  -- splitmix64(j+seed) / splitmix64(j+seed+0x10000), seed=42
  SELECT CAST(j AS BIGINT) AS j,
         CAST(xor(z3a, z3a >> 31) % 2147483647 + 1 AS BIGINT) AS a,
         CAST(xor(z3b, z3b >> 31) % 2305843009213693951 AS BIGINT) AS b
  FROM (
    -- mulmod 2^64 via 32-bit split (z*m = z*ml + ((z*mh mod 2^32)<<32)) so
    -- the INT128 intermediate never overflows
    SELECT j,
           ((xor(z2a, z2a >> 27) * 321982955) % 18446744073709551616
            + ((xor(z2a, z2a >> 27) * 2496678331) % 4294967296) * 4294967296)
             % 18446744073709551616 AS z3a,
           ((xor(z2b, z2b >> 27) * 321982955) % 18446744073709551616
            + ((xor(z2b, z2b >> 27) * 2496678331) % 4294967296) * 4294967296)
             % 18446744073709551616 AS z3b
    FROM (
      SELECT j,
             ((xor(z1a, z1a >> 30) * 484763065) % 18446744073709551616
              + ((xor(z1a, z1a >> 30) * 3210233709) % 4294967296) * 4294967296)
               % 18446744073709551616 AS z2a,
             ((xor(z1b, z1b >> 30) * 484763065) % 18446744073709551616
              + ((xor(z1b, z1b >> 30) * 3210233709) % 4294967296) * 4294967296)
               % 18446744073709551616 AS z2b
      FROM (
        SELECT j,
               (j + 42 + CAST(11400714819323198485 AS HUGEINT))
                 % 18446744073709551616 AS z1a,
               (j + 42 + 65536 + CAST(11400714819323198485 AS HUGEINT))
                 % 18446744073709551616 AS z1b
        FROM range(64) t(j)
      )
    )
  )
),
sig AS (
  SELECT s.doc_id, p.j,
         CAST(MIN((CAST(p.a AS HUGEINT) * s.x + p.b) % 2305843009213693951) AS BIGINT) AS sv
  FROM shx s CROSS JOIN perms p GROUP BY s.doc_id, p.j
),
bh AS (
  SELECT doc_id, CAST(band_id AS BIGINT) AS band_id,
         CAST(list_reduce(
           list_prepend(CAST(14695981039346656037 AS HUGEINT),
                        list(CAST(sv AS HUGEINT) ORDER BY j)),
           (h, c) -> (xor(h, c) * 1099511628211) % 18446744073709551616
         ) AS UBIGINT) AS band_hash
  FROM (SELECT doc_id, j, j // 4 AS band_id, sv FROM sig)
  GROUP BY doc_id, band_id
),
capped AS (
  SELECT * FROM (
    SELECT doc_id, band_id, band_hash,
           ROW_NUMBER() OVER (PARTITION BY band_id, band_hash ORDER BY doc_id) AS rn
    FROM bh
  ) WHERE rn <= 256
)
"""

SQL_DOC_MINHASH_PAIRS = _SQL_MINHASH_CTES + """
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM capped a JOIN capped b
  ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
"""

SQL_DOC_MINHASH_VERIFIED = _SQL_MINHASH_CTES + """
, cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM capped a JOIN capped b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(SUM(CASE WHEN sa.sv = sb.sv THEN 1 ELSE 0 END) AS DOUBLE) / 64.0 AS jaccard_est
FROM cand c
JOIN sig sa ON sa.doc_id = c.doc_a
JOIN sig sb ON sb.doc_id = c.doc_b AND sb.j = sa.j
GROUP BY c.doc_a, c.doc_b
HAVING SUM(CASE WHEN sa.sv = sb.sv THEN 1 ELSE 0 END) >= 32
"""

# ---------------------------------------------------------------------------
# embeddings: similarity search
# ---------------------------------------------------------------------------

def _sim_q4(batch: pa.Table) -> pa.Table:
    return pa.table(
        {
            "query_id": batch["query_id"],
            "vec_id": batch["vec_id"],
            "sim_rank": batch["sim_rank"],
            "sim_q4": cents(batch["sim"].to_numpy(zero_copy_only=False), 10000),
        }
    )


def q_ann_topk(sf_dir: str):
    emb = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    qtab = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
                         filters=[("vec_id", "<", 8)])  # pushed-down query-side read
    qtab = pa.table({"query_id": qtab["vec_id"], "embedding": qtab["embedding"]})
    out = ann.cosine_topk(emb, ray.put(qtab), k=5)
    return out.map_batches(_sim_q4, batch_format="pyarrow")


def q_ann_join_sharded(sf_dir: str):  # exact oracle (shares ann_ivf's routing)
    """TWO-SIDED distributed vector join (``ann.sharded_cosine_join``):
    query side and corpus side are both unbounded Datasets — no broadcast
    anywhere (the general corpus-vs-corpus shape VERDICT r4 item 3 asked
    for; every other ANN query rides a ``ray.put`` query handle). Both
    sides shuffle ONCE keyed by (IVF list, skew sub-shard); per-group
    matmul; bucketed global top-k. Routing identical to ``ann_ivf``
    (same ±1 codebook, nprobe=8 of 64), so SQL_ANN_IVF is the exact
    oracle; ``list_shards=2`` exercises hot-list salting, to which the
    result is provably invariant."""
    emb = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    queries = _rp(sf_dir, "embeddings", ["vec_id", "embedding"]).filter(
        expr="vec_id < 8")
    out = ann.sharded_cosine_join(queries, emb, k=5, n_centroids=64,
                                  nprobe=8, list_shards=2)
    return out.map_batches(_sim_q4, batch_format="pyarrow")


def q_ann_join_pq_sharded(sf_dir: str):  # exact oracle (shares ann_ivfpq's SQL)
    """CODES-NOT-VECTORS two-sided vector join (``ann.sharded_adc_join``):
    the sharded-join routing/salting skeleton with IVF-PQ scoring — corpus
    rows cross the exchange as (list, id, one packed int64 PQ code), 24
    bytes/row instead of the embedding; groups score by integer ADC. The
    LAION-scale shape: shuffling 1-2% of the corpus bytes. Bit-identical
    to ``ann_ivfpq`` (same codebooks/routing/ties), so SQL_ANN_IVFPQ is
    the exact oracle; ``list_shards=2`` exercises hot-list salting."""
    emb = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    queries = _rp(sf_dir, "embeddings", ["vec_id", "embedding"]).filter(
        expr="vec_id < 8")
    return ann.sharded_adc_join(queries, emb, _pq_cents_ref(sf_dir), k=5,
                                n_centroids=64, nprobe=8, list_shards=2)


SQL_ANN_TOPK = """
WITH q AS (SELECT vec_id AS query_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
           FROM embeddings WHERE vec_id < 8),
sims AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.qe, list_transform(e.embedding, x -> CAST(x AS DOUBLE))) AS sim
  FROM q CROSS JOIN embeddings e
  WHERE e.vec_id <> q.query_id
)
SELECT query_id, vec_id, sim_rank, CAST(FLOOR(sim * 10000 + 0.5) AS BIGINT) AS sim_q4 FROM (
  SELECT query_id, vec_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS sim_rank
  FROM sims
) WHERE sim_rank <= 5
"""


def q_embedding_norms(sf_dir: str):
    emb = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    norms = ann.l2_norms(emb)

    def _q(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "norm_q4": cents(batch["l2_norm"].to_numpy(zero_copy_only=False), 10000),
            }
        )

    return norms.map_batches(_q, batch_format="pyarrow")


SQL_EMBEDDING_NORMS = """
SELECT vec_id,
       CAST(FLOOR(sqrt(list_sum(list_transform(embedding,
            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * 10000 + 0.5) AS BIGINT) AS norm_q4
FROM embeddings
"""

# ---------------------------------------------------------------------------
# iterative re-match (T3), value distribution (A2), pivot (A7), rank (O4),
# traffic chain (T6+J7+A3)
# ---------------------------------------------------------------------------

def q_iterative_match(sf_dir: str):
    """Round-1 containment match; unmatched points fall back to the nearest
    tile centroid within radius 4000 (round 2); still-unmatched dropped."""
    pts = conflation.read_points(sf_dir)
    out = spatial.best_tile_join(pts, conflation.tiles_ref(sf_dir), "px", "py",
                                 ["point_id"], radius=4000)
    return out.select_columns(["point_id", "tile_id", "dist2", "match_round"])


SQL_ITERATIVE_MATCH = _CTES + """
, pip AS (
  SELECT p.point_id, t.tile_id,
         (p.px - t.cx) * (p.px - t.cx) + (p.py - t.cy) * (p.py - t.cy) AS dist2,
         ROW_NUMBER() OVER (
           PARTITION BY p.point_id
           ORDER BY (p.px - t.cx) * (p.px - t.cx) + (p.py - t.cy) * (p.py - t.cy), t.tile_id
         ) AS rn
  FROM points p JOIN tiles t
    ON p.px BETWEEN t.cx - t.hw AND t.cx + t.hw
   AND p.py BETWEEN t.cy - t.hh AND t.cy + t.hh
),
best1 AS (SELECT point_id, tile_id, dist2, CAST(1 AS BIGINT) AS match_round FROM pip WHERE rn = 1),
un AS (SELECT * FROM points WHERE point_id NOT IN (SELECT point_id FROM best1)),
knn AS (
  SELECT point_id, tile_id, dist2,
         ROW_NUMBER() OVER (PARTITION BY point_id ORDER BY dist2, tile_id) AS rn
  FROM (
    SELECT p.point_id, t.tile_id,
           (p.px - t.cx) * (p.px - t.cx) + (p.py - t.cy) * (p.py - t.cy) AS dist2
    FROM un p CROSS JOIN tiles t
  )
),
best2 AS (SELECT point_id, tile_id, dist2, CAST(2 AS BIGINT) AS match_round
          FROM knn WHERE rn = 1 AND dist2 <= 16000000)
SELECT * FROM best1 UNION ALL SELECT * FROM best2
"""


def q_value_distribution(sf_dir: str):
    """Distribute each order's total price across its lineitems by quantity
    share — ≙ A2 travel-time distribution over a joined path
    (``GtfsConflationScheduleJoinDAO/loaders.js:212-263``)."""
    li = _rp(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity"])

    def _qc(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "l_linenumber": batch["l_linenumber"],
                "qc": cents(batch["l_quantity"].to_numpy(zero_copy_only=False)),
            }
        )

    d = li.map_batches(_qc, batch_format="pyarrow", batch_size=8192)
    # combiner-first plan: the per-order qty totals pre-aggregate (tiny
    # shuffle), then join back and compute shares MAP-SIDE — the raw fact
    # rows never enter a whole-group shuffle (the round-1 grouped_agg moved
    # every lineitem row into group buckets just to compute a transform-sum)
    totals = rel.partial_groupby_sum(d, ["l_orderkey"], ["qc"],
                                     est_rows=_nrows(sf_dir, "lineitem"))
    totals = totals.map_batches(
        lambda t: t.rename_columns(["l_orderkey", "tot_qc"]), batch_format="pyarrow"
    )
    orders = _rp(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    # re-associated join order: the two ORDER-grained sides (each ~n_orders
    # rows) join first, so the FACT table passes through one hash-join
    # shuffle instead of two — halves the fact-table exchange volume (at
    # bench scale the two plans time within host noise of each other)
    aux = totals.join(orders, "inner", 8, on=("l_orderkey",), right_on=("o_orderkey",))
    j2 = d.join(aux, "inner", 8, on=("l_orderkey",), right_on=("l_orderkey",))

    def _share(batch: pa.Table) -> pa.Table:
        share = (batch["o_totalprice"].to_numpy(zero_copy_only=False)
                 * batch["qc"].to_numpy(zero_copy_only=False)
                 / batch["tot_qc"].to_numpy(zero_copy_only=False).astype(np.float64))
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "l_linenumber": batch["l_linenumber"],
                "share_c": np.floor(share * 100 + 0.5).astype(np.int64),
            }
        )

    return j2.map_batches(_share, batch_format="pyarrow", batch_size=8192)


SQL_VALUE_DISTRIBUTION = """
SELECT l_orderkey, l_linenumber,
       CAST(FLOOR(o_totalprice * CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)
            / SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) OVER (PARTITION BY l_orderkey)
            * 100 + 0.5) AS BIGINT) AS share_c
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
"""


def q_value_quantiles(sf_dir: str):
    """Grouped quantile sketch of lineitem prices — the global-distribution
    aggregate VERDICT r2 flagged as missing (A10 analog at dataset scale).
    Fixed-width 4096-bin integer histogram, partial-combined per batch, so
    the shuffle is bounded by groups x bins no matter the input size; the
    reported quantile is the lower edge of the nearest-rank bin (error <= one
    bin width). Integer-exact decisions -> exact DuckDB oracle."""
    li = _rp(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_extendedprice"])

    def _prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "price_c": cents(batch["l_extendedprice"].to_numpy(zero_copy_only=False)),
            }
        )

    d = li.map_batches(_prep, batch_format="pyarrow", batch_size=8192)
    return rel.binned_quantiles(d, ["l_returnflag", "l_linestatus"], "price_c",
                                vmax=11_000_000, est_rows=_nrows(sf_dir, "lineitem"))


_Q_TARGETS = [("q10", 1, 10), ("q25", 1, 4), ("q50", 1, 2), ("q75", 3, 4), ("q90", 9, 10)]

SQL_VALUE_QUANTILES = """
WITH b AS (
  SELECT l_returnflag, l_linestatus,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) * 4096 // 11000001 AS bin
  FROM lineitem
),
h AS (SELECT l_returnflag, l_linestatus, bin, COUNT(*) AS cnt FROM b GROUP BY 1, 2, 3),
c AS (SELECT l_returnflag, l_linestatus, bin, cnt,
             SUM(cnt) OVER (PARTITION BY l_returnflag, l_linestatus ORDER BY bin) AS cum,
             SUM(cnt) OVER (PARTITION BY l_returnflag, l_linestatus) AS n
      FROM h)
SELECT l_returnflag, l_linestatus, CAST(MAX(n) AS BIGINT) AS n,
""" + ",\n".join(
    f"       CAST(MIN(CASE WHEN cum >= (n * {qn} + {qd - 1}) // {qd}"
    f" AND cum - cnt < (n * {qn} + {qd - 1}) // {qd}"
    f" THEN bin * 11000001 // 4096 END) AS BIGINT) AS {name}"
    for name, qn, qd in _Q_TARGETS
) + """
FROM c GROUP BY 1, 2
"""


def q_season_pivot(sf_dir: str):
    """Pivot the season buckets into columns — ≙ A7 AADT peak pivot
    (``GtfsConflationScheduleJoinDAO/createTableFns.js:108-202``)."""
    li = _rp(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_shipdate"])

    def _derive(batch: pa.Table) -> pa.Table:
        month = pc.month(batch["l_shipdate"]).to_numpy(zero_copy_only=False)
        qc = cents(batch["l_quantity"].to_numpy(zero_copy_only=False))
        cols = {"l_returnflag": batch["l_returnflag"]}
        for name, months in [("win_c", (12, 1, 2)), ("spr_c", (3, 4, 5)),
                             ("sum_c", (6, 7, 8)), ("fal_c", (9, 10, 11))]:
            cols[name] = np.where(np.isin(month, months), qc, 0)
        return pa.table(cols)

    d = li.map_batches(_derive, batch_format="pyarrow", batch_size=8192)
    return rel.partial_groupby_sum(d, ["l_returnflag"], ["win_c", "spr_c", "sum_c", "fal_c"])


SQL_SEASON_PIVOT = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN EXTRACT(MONTH FROM l_shipdate) IN (12, 1, 2)
                THEN CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS win_c,
       CAST(SUM(CASE WHEN EXTRACT(MONTH FROM l_shipdate) IN (3, 4, 5)
                THEN CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS spr_c,
       CAST(SUM(CASE WHEN EXTRACT(MONTH FROM l_shipdate) IN (6, 7, 8)
                THEN CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS sum_c,
       CAST(SUM(CASE WHEN EXTRACT(MONTH FROM l_shipdate) IN (9, 10, 11)
                THEN CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS fal_c
FROM lineitem GROUP BY l_returnflag
"""


def q_season_pivot_json(sf_dir: str):
    """Nested-JSON pivot: per returnflag, one JSON-object STRING keyed by
    season — ≙ A7's ``json_group_object`` AADT pivots
    (``GtfsConflationScheduleJoinDAO/createTableFns.js:163-199``). Keys
    sorted, compact rendering; byte-identical to the SQL string_agg oracle."""
    li = _rp(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_shipdate"])

    def _derive(batch: pa.Table) -> pa.Table:
        month = pc.month(batch["l_shipdate"]).to_numpy(zero_copy_only=False)
        season = np.select(
            [np.isin(month, (12, 1, 2)), np.isin(month, (3, 4, 5)), np.isin(month, (6, 7, 8))],
            ["WIN", "SPR", "SUM"],
            default="FAL",
        )
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "season": season,
                "qty_c": cents(batch["l_quantity"].to_numpy(zero_copy_only=False)),
            }
        )

    d = li.map_batches(_derive, batch_format="pyarrow", batch_size=8192)
    agg = rel.partial_groupby_sum(d, ["l_returnflag", "season"], ["qty_c"])

    def _to_json(g: pd.DataFrame) -> pd.DataFrame:
        def _obj(grp: pd.DataFrame) -> str:
            items = grp.sort_values("season")
            return "{" + ",".join(
                f'"{s}":{int(v)}' for s, v in zip(items["season"], items["qty_c"])
            ) + "}"

        s = g.groupby("l_returnflag", sort=False).apply(_obj, include_groups=False)
        return s.rename("season_json").reset_index()

    return rel.grouped_agg(agg, ["l_returnflag"], _to_json)


SQL_SEASON_PIVOT_JSON = """
WITH b AS (
  SELECT l_returnflag,
         CASE WHEN EXTRACT(MONTH FROM l_shipdate) IN (12, 1, 2) THEN 'WIN'
              WHEN EXTRACT(MONTH FROM l_shipdate) IN (3, 4, 5) THEN 'SPR'
              WHEN EXTRACT(MONTH FROM l_shipdate) IN (6, 7, 8) THEN 'SUM'
              ELSE 'FAL' END AS season,
         CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS qty_c
  FROM lineitem GROUP BY 1, 2
)
SELECT l_returnflag,
       '{' || string_agg('"' || season || '":' || CAST(qty_c AS VARCHAR), ',' ORDER BY season) || '}' AS season_json
FROM b GROUP BY l_returnflag
"""


def q_customer_order_rank(sf_dir: str):
    """RANK() with ties per customer (≙ O4 along_idx rank toposort,
    ``GtfsConflationMapJoinDAO/loaders.js:319-372``); keep rank <= 3."""
    orders = _rp(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    orders = orders.map_batches(_with_cents("o_totalprice", "totalprice_c"), batch_format="pyarrow")
    orders = orders.select_columns(["o_custkey", "o_orderkey", "totalprice_c"])

    def _rank(g: pd.DataFrame) -> pd.DataFrame:
        r = g.groupby("o_custkey", sort=False)["totalprice_c"].rank(
            method="min", ascending=False
        ).astype(np.int64)
        out = g.assign(price_rank=r)
        return out[out["price_rank"] <= 3]

    return rel.grouped_agg(orders, ["o_custkey"], _rank,
                           est_rows=_nrows(sf_dir, "orders"))


SQL_CUSTOMER_ORDER_RANK = """
SELECT o_custkey, o_orderkey, totalprice_c, price_rank FROM (
  SELECT o_custkey, o_orderkey,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS totalprice_c,
         RANK() OVER (PARTITION BY o_custkey
                      ORDER BY CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) DESC) AS price_rank
  FROM orders
) WHERE price_rank <= 3
"""


def q_traffic_rollup(sf_dir: str):
    """TripTracker-style chain: per-user ordered segments -> best containing
    tile of the segment start -> (tile, 5-min epoch) travel-time rollup."""
    from ..stages import traffic

    pts = _event_shapes(sf_dir)
    return traffic.traffic_rollup(pts, conflation.tiles_ref(sf_dir),
                                  est_rows=_nrows(sf_dir, "events"))


SQL_TRAFFIC_ROLLUP = _CTES + """
, pts AS (
  SELECT user_id, ts, event_id,
         (event_id * 48271 + user_id * 977) % 65536 AS ex,
         (event_id * 69621 + 13) % 65536 AS ey
  FROM events
),
seg AS (
  SELECT user_id, event_id, ex, ey,
         (epoch_us(ts) // 1000000) // 300 AS epoch5m,
         (lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          - epoch_us(ts)) // 1000 AS tt_ms
  FROM pts
),
seg2 AS (SELECT * FROM seg WHERE tt_ms IS NOT NULL),
pip AS (
  SELECT s.event_id, s.epoch5m, s.tt_ms, t.tile_id,
         ROW_NUMBER() OVER (
           PARTITION BY s.event_id
           ORDER BY (s.ex - t.cx) * (s.ex - t.cx) + (s.ey - t.cy) * (s.ey - t.cy), t.tile_id
         ) AS rn
  FROM seg2 s JOIN tiles t
    ON s.ex BETWEEN t.cx - t.hw AND t.cx + t.hw
   AND s.ey BETWEEN t.cy - t.hh AND t.cy + t.hh
)
SELECT tile_id, epoch5m, CAST(SUM(tt_ms) AS BIGINT) AS tt_ms, COUNT(*) AS n_segs
FROM pip WHERE rn = 1 GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# shape/segment kernels over event-derived polylines (SURVEY §2.8, §3.1)
# ---------------------------------------------------------------------------

def _event_shapes(sf_dir: str):
    from ..stages import segments

    ev = _rp(sf_dir, "events", ["event_id", "user_id", "ts"])
    return ev.map_batches(segments.event_points_batch, batch_format="pyarrow",
                          batch_size=8192)


def q_shape_stats(sf_dir: str):
    from ..stages import segments

    return segments.shape_stats(_event_shapes(sf_dir))


SQL_SHAPE_STATS = """
WITH pts AS (
  SELECT user_id, ts, event_id,
         (event_id * 48271 + user_id * 977) % 65536 AS ex,
         (event_id * 69621 + 13) % 65536 AS ey
  FROM events
),
o AS (
  SELECT user_id, ex, ey,
         lag(ex) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS px,
         lag(ey) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS py
  FROM pts
)
SELECT user_id, COUNT(*) AS n_points,
       CAST(COALESCE(SUM(CASE WHEN px IS NULL THEN NULL ELSE
         CAST(FLOOR(sqrt(CAST((ex - px) * (ex - px) + (ey - py) * (ey - py) AS DOUBLE)) * 100 + 0.5) AS BIGINT)
       END), 0) AS BIGINT) AS length_c
FROM o GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# SQL building blocks for the integer-exact shape kernels (stages/segments.py
# ``seg_len_c`` / ``rdp_keep_int`` / ``point_seg_d2f`` / ``frechet_sq_int`` /
# ``stride_pick``): the same per-segment-quantized lengths, the same one
# mirrored double expression per comparison
# ---------------------------------------------------------------------------

_SQL_SHAPE_PTS = """
pts AS MATERIALIZED (
  SELECT user_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS gi,
         CAST((event_id * 48271 + user_id * 977) % 65536 AS BIGINT) AS x,
         CAST((event_id * 69621 + 13) % 65536 AS BIGINT) AS y
  FROM events
),
nn AS (SELECT user_id, COUNT(*) AS n FROM pts GROUP BY user_id),
segs AS (
  SELECT user_id, gi,
         CAST(FLOOR(sqrt(CAST((nx - x)*(nx - x) + (ny - y)*(ny - y) AS DOUBLE)) * 100 + 0.5) AS BIGINT) AS len_c
  FROM (SELECT user_id, gi, x, y,
               lead(x) OVER (PARTITION BY user_id ORDER BY gi) AS nx,
               lead(y) OVER (PARTITION BY user_id ORDER BY gi) AS ny
        FROM pts)
  WHERE nx IS NOT NULL
)
"""


def _sql_rdp(tol2: int) -> str:
    """Recursive RDP: every level splits each open interval at its argmax
    point (argmax |cross|, ties -> smallest index; split iff cross² >
    tol²·|ab|², the ``rdp_keep_int`` rule)."""
    return f"""
ends AS (SELECT user_id, MIN(gi) AS s0, MAX(gi) AS e0 FROM pts GROUP BY user_id),
rdp AS (
  SELECT user_id, s0 AS s, e0 AS e FROM ends WHERE e0 > s0 + 1
  UNION ALL
  SELECT g.user_id,
         CASE c.side WHEN 0 THEN g.s ELSE g.m END AS s,
         CASE c.side WHEN 0 THEN g.m ELSE g.e END AS e
  FROM (
    SELECT r.user_id, r.s, r.e, t.ab2,
           MAX(CASE WHEN t.ab2 = 0 THEN u.d2a ELSE u.cr END) AS mkey,
           max_by(p.gi, (CASE WHEN t.ab2 = 0 THEN u.d2a ELSE u.cr END) * 1048576 - p.gi) AS m
    FROM rdp r
    JOIN pts a ON a.user_id = r.user_id AND a.gi = r.s
    JOIN pts b ON b.user_id = r.user_id AND b.gi = r.e
    JOIN pts p ON p.user_id = r.user_id AND p.gi > r.s AND p.gi < r.e,
    LATERAL (SELECT (b.x-a.x)*(b.x-a.x) + (b.y-a.y)*(b.y-a.y) AS ab2,
                    b.x-a.x AS dx, b.y-a.y AS dy) t,
    LATERAL (SELECT (p.x-a.x)*(p.x-a.x) + (p.y-a.y)*(p.y-a.y) AS d2a,
                    abs(t.dx*(p.y-a.y) - t.dy*(p.x-a.x)) AS cr) u
    WHERE r.e > r.s + 1
    GROUP BY r.user_id, r.s, r.e, t.ab2
  ) g, (VALUES (0), (1)) c(side)
  WHERE CASE WHEN g.ab2 = 0 THEN g.mkey > {tol2}
             ELSE CAST(g.mkey AS DOUBLE) * CAST(g.mkey AS DOUBLE)
                  > CAST({tol2} * g.ab2 AS DOUBLE) END
),
keep AS (
  SELECT DISTINCT user_id, gi FROM (
    SELECT user_id, s AS gi FROM rdp UNION ALL SELECT user_id, e AS gi FROM rdp
    UNION ALL SELECT user_id, s0 AS gi FROM ends UNION ALL SELECT user_id, e0 AS gi FROM ends
  )
)
"""


def _sql_dev(tol2: int) -> str:
    """RDP(tol2)-simplified self + exact min point→segment squared distance
    per vertex (``point_seg_d2f``: integer inside-test, one mirrored double
    expression per branch)."""
    return _sql_rdp(tol2) + """,
simp AS (SELECT k.user_id, p.gi, p.x, p.y,
                ROW_NUMBER() OVER (PARTITION BY k.user_id ORDER BY p.gi) AS si
         FROM keep k JOIN pts p USING (user_id, gi)),
sseg AS (
  SELECT user_id, si, x AS sax, y AS say, nx AS sbx, ny AS sby
  FROM (SELECT user_id, si, x, y,
               lead(x) OVER (PARTITION BY user_id ORDER BY si) AS nx,
               lead(y) OVER (PARTITION BY user_id ORDER BY si) AS ny
        FROM simp)
  WHERE nx IS NOT NULL
),
dev AS (
  SELECT p.user_id, p.gi,
         MIN(CASE WHEN u.ab2 = 0 THEN u.d2a
                  WHEN u.dot < 0 THEN u.d2a
                  WHEN u.dot > u.ab2 THEN u.d2b
                  ELSE (u.cf * u.cf) / CAST(u.ab2 AS DOUBLE) END) AS d2
  FROM pts p
  JOIN sseg s USING (user_id),
  LATERAL (SELECT s.sbx - s.sax AS abx, s.sby - s.say AS aby,
                  p.x - s.sax AS apx, p.y - s.say AS apy,
                  p.x - s.sbx AS bpx, p.y - s.sby AS bpy) t,
  LATERAL (SELECT t.abx*t.abx + t.aby*t.aby AS ab2,
                  t.apx*t.abx + t.apy*t.aby AS dot,
                  CAST(t.apx*t.aby - t.apy*t.abx AS DOUBLE) AS cf,
                  CAST(t.apx*t.apx + t.apy*t.apy AS DOUBLE) AS d2a,
                  CAST(t.bpx*t.bpx + t.bpy*t.bpy AS DOUBLE) AS d2b) u
  GROUP BY p.user_id, p.gi
)
"""


def q_shape_frechet(sf_dir: str):
    from ..stages import segments

    return segments.shape_frechet_halves(_event_shapes(sf_dir))


# anti-diagonal discrete-Fréchet DP over two 32-vertex picked polylines
# (pax/pay vs pbx/pby from a `picked` CTE); all cells are int64 squared
# distances, shared by SQL_SHAPE_FRECHET and SQL_CHOOSE_SCORE
_SQL_FRECHET_DP = """
fr AS (  -- discrete-Fréchet DP by anti-diagonals; lists are int64 d²
  SELECT user_id, 0 AS k,
         [(pax[1] - pbx[1]) * (pax[1] - pbx[1])
          + (pay[1] - pby[1]) * (pay[1] - pby[1])] AS cur,
         CAST(NULL AS BIGINT[]) AS prev,
         pax, pay, pbx, pby
  FROM picked
  UNION ALL
  SELECT user_id, k + 1,
         [ greatest(
             (pax[_i + 1] - pbx[k + 1 - _i + 1]) * (pax[_i + 1] - pbx[k + 1 - _i + 1])
             + (pay[_i + 1] - pby[k + 1 - _i + 1]) * (pay[_i + 1] - pby[k + 1 - _i + 1]),
             least(
               COALESCE(cur[_i - greatest(0, k - 31) + 1], 36893488147419103232),
               COALESCE(cur[_i - 1 - greatest(0, k - 31) + 1], 36893488147419103232),
               COALESCE(prev[_i - 1 - greatest(0, k - 1 - 31) + 1], 36893488147419103232)
             )
           )
           FOR _i IN range(greatest(0, k + 1 - 31), least(k + 1, 31) + 1) ] AS cur,
         cur AS prev, pax, pay, pbx, pby
  FROM fr WHERE k < 62
)"""

SQL_SHAPE_FRECHET = "WITH RECURSIVE " + _SQL_SHAPE_PTS + f""",
halves AS (
  SELECT p.user_id,
         list(p.x ORDER BY p.gi) FILTER (WHERE p.gi <= n.n // 2) AS ax,
         list(p.y ORDER BY p.gi) FILTER (WHERE p.gi <= n.n // 2) AS ay,
         list(p.x ORDER BY p.gi) FILTER (WHERE p.gi > n.n // 2) AS bx,
         list(p.y ORDER BY p.gi) FILTER (WHERE p.gi > n.n // 2) AS "by"
  FROM pts p JOIN nn n USING (user_id) WHERE n.n >= 4
  GROUP BY p.user_id
),
picked AS (  -- stride_pick to 32 vertices per half (exact index selection)
  SELECT user_id,
         [ax[1 + _j * (len(ax) - 1) // 31] FOR _j IN range(32)] AS pax,
         [ay[1 + _j * (len(ay) - 1) // 31] FOR _j IN range(32)] AS pay,
         [bx[1 + _j * (len(bx) - 1) // 31] FOR _j IN range(32)] AS pbx,
         ["by"[1 + _j * (len("by") - 1) // 31] FOR _j IN range(32)] AS pby
  FROM halves
),
""" + _SQL_FRECHET_DP + """
SELECT n.user_id,
       CAST(CASE WHEN n.n < 4 THEN -1 ELSE f.cur[1] END AS BIGINT) AS frechet_sq
FROM nn n LEFT JOIN (SELECT user_id, cur FROM fr WHERE k = 62) f USING (user_id)
"""


def q_shape_line_chunk(sf_dir: str):
    """turf ``lineChunk`` as an operator (the last §2.8 turf leftover): split
    each shape polyline into fixed-length 10^7-centi-unit chunks along its
    cumulative length and report per chunk the exact covered length and the
    number of touching segments. Chunk boundaries are exact multiples of L
    on the int cum-length axis, so each segment's contribution to chunk k is
    the pure-integer overlap ``min(cum2,(k+1)L) − max(cum1,kL)`` — no
    interpolated geometry, no division, bit-exact vs the oracle."""
    from ..stages import segments

    L = np.int64(10_000_000)

    def _fn(uid: int, xy: np.ndarray):
        xyi = xy.astype(np.int64)
        if len(xyi) < 2:
            return []
        lc = segments.seg_len_c(xyi)
        cum = np.concatenate([[np.int64(0)], np.cumsum(lc)])
        acc: dict[int, list[int]] = {}
        for i in range(len(lc)):
            if lc[i] <= 0:
                continue
            c1, c2 = int(cum[i]), int(cum[i + 1])
            for k in range(c1 // int(L), (c2 - 1) // int(L) + 1):
                piece = min(c2, (k + 1) * int(L)) - max(c1, k * int(L))
                if piece > 0:
                    a = acc.setdefault(k, [0, 0])
                    a[0] += piece
                    a[1] += 1
        return [{"user_id": uid, "chunk_idx": np.int64(k),
                 "chunk_len_c": np.int64(v[0]), "n_segs": np.int64(v[1])}
                for k, v in sorted(acc.items())]

    return segments.per_shape(_event_shapes(sf_dir), _fn)


SQL_SHAPE_LINE_CHUNK = """
WITH pts AS (
  SELECT user_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gi,
         CAST((event_id * 48271 + user_id * 977) % 65536 AS BIGINT) AS x,
         CAST((event_id * 69621 + 13) % 65536 AS BIGINT) AS y
  FROM events
),
segs AS (
  SELECT user_id, gi,
         CAST(FLOOR(sqrt(CAST((nx - x)*(nx - x) + (ny - y)*(ny - y) AS DOUBLE))
                    * 100 + 0.5) AS BIGINT) AS len_c
  FROM (SELECT user_id, gi, x, y,
               lead(x) OVER (PARTITION BY user_id ORDER BY gi) AS nx,
               lead(y) OVER (PARTITION BY user_id ORDER BY gi) AS ny
        FROM pts)
  WHERE nx IS NOT NULL
),
cums AS (
  SELECT user_id, gi, len_c,
         CAST(COALESCE(SUM(len_c) OVER (PARTITION BY user_id ORDER BY gi
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum1
  FROM segs
),
pieces AS (
  SELECT user_id, t.k,
         least(cum1 + len_c, (t.k + 1) * 10000000)
           - greatest(cum1, t.k * 10000000) AS piece
  FROM cums, LATERAL (SELECT unnest(range(cum1 // 10000000,
                              (cum1 + len_c - 1) // 10000000 + 1)) AS k) t
  WHERE len_c > 0
)
SELECT user_id, CAST(k AS BIGINT) AS chunk_idx,
       CAST(SUM(piece) AS BIGINT) AS chunk_len_c,
       CAST(COUNT(*) AS BIGINT) AS n_segs
FROM pieces WHERE piece > 0
GROUP BY user_id, k
"""


def q_shape_hull(sf_dir: str):
    """Integer convex hull per shape (turf ``convex`` parity — the reference
    hulls/buffers segment geometry into geopoly probes,
    ``ConflationMapDAO/loaders.js:104-113``): Andrew monotone chain over the
    shape's distinct event points, CCW from the lexicographic minimum, plus
    the int64 shoelace double-area. The oracle SIMULATES the same
    stack-machine in a recursive CTE (one pop or one push per recursion
    round), so engine and SQL agree on every cross-product tie."""
    from ..functions.geom import convex_hull_int, shoelace_area2
    from ..stages import segments

    def _fn(uid: int, xy: np.ndarray):
        hull = convex_hull_int(xy.astype(np.int64))
        a2 = np.int64(shoelace_area2(hull))
        return [{"user_id": uid, "hi": np.int64(i + 1),
                 "hx": np.int64(x), "hy": np.int64(y), "area2": a2}
                for i, (x, y) in enumerate(hull)]

    return segments.per_shape(_event_shapes(sf_dir), _fn)


SQL_SHAPE_HULL = """
WITH RECURSIVE
pts AS MATERIALIZED (
  SELECT DISTINCT user_id,
         CAST((event_id * 48271 + user_id * 977) % 65536 AS BIGINT) AS x,
         CAST((event_id * 69621 + 13) % 65536 AS BIGINT) AS y
  FROM events
),
dirs AS MATERIALIZED (  -- lexsorted point lists, ascending (lower) + descending (upper)
  SELECT user_id, d.dir,
         list(x ORDER BY CASE WHEN d.dir = 0 THEN x ELSE -x END,
                         CASE WHEN d.dir = 0 THEN y ELSE -y END) AS px,
         list(y ORDER BY CASE WHEN d.dir = 0 THEN x ELSE -x END,
                         CASE WHEN d.dir = 0 THEN y ELSE -y END) AS py,
         COUNT(*) AS n
  FROM pts CROSS JOIN (VALUES (0), (1)) d(dir)
  GROUP BY user_id, d.dir
),
walk AS (  -- monotone-chain stack machine: one pop OR one push per round
  SELECT user_id, dir, 0 AS i,
         CAST([] AS BIGINT[]) AS sx, CAST([] AS BIGINT[]) AS sy
  FROM dirs WHERE n >= 3
  UNION ALL
  SELECT user_id, dir,
         CASE WHEN pop THEN i ELSE i + 1 END,
         CASE WHEN pop THEN sx[1:len(sx)-1] ELSE sx || [qx] END,
         CASE WHEN pop THEN sy[1:len(sy)-1] ELSE sy || [qy] END
  FROM (
    SELECT w.user_id, w.dir, w.i, w.sx, w.sy,
           d.px[w.i+1] AS qx, d.py[w.i+1] AS qy,
           len(w.sx) >= 2 AND
             (w.sx[len(w.sx)] - w.sx[len(w.sx)-1]) * (d.py[w.i+1] - w.sy[len(w.sy)-1])
           - (w.sy[len(w.sy)] - w.sy[len(w.sy)-1]) * (d.px[w.i+1] - w.sx[len(w.sx)-1])
             <= 0 AS pop
    FROM walk w JOIN dirs d USING (user_id, dir)
    WHERE w.i < d.n
  )
),
fin AS MATERIALIZED (
  SELECT w.user_id, w.dir, w.sx, w.sy
  FROM walk w JOIN dirs d USING (user_id, dir) WHERE w.i = d.n
),
hull AS MATERIALIZED (  -- lower[:-1] + upper[:-1]; <=2 distinct pts pass through
  SELECT l.user_id,
         l.sx[1:len(l.sx)-1] || u.sx[1:len(u.sx)-1] AS hx,
         l.sy[1:len(l.sy)-1] || u.sy[1:len(u.sy)-1] AS hy
  FROM (SELECT user_id, sx, sy FROM fin WHERE dir = 0) l
  JOIN (SELECT user_id, sx, sy FROM fin WHERE dir = 1) u USING (user_id)
  UNION ALL
  SELECT p.user_id, list(p.x ORDER BY p.x, p.y), list(p.y ORDER BY p.x, p.y)
  FROM pts p JOIN (SELECT user_id FROM dirs WHERE dir = 0 AND n <= 2) s
    USING (user_id)
  GROUP BY p.user_id
),
ar AS (
  SELECT user_id, hx, hy,
         CASE WHEN len(hx) < 3 THEN 0
              ELSE list_sum([hx[j+1] * hy[1 + (j+1) % len(hx)]
                             - hx[1 + (j+1) % len(hx)] * hy[j+1]
                             FOR j IN range(len(hx))]) END AS area2
  FROM hull
)
SELECT user_id, CAST(j + 1 AS BIGINT) AS hi,
       hx[j+1] AS hx, hy[j+1] AS hy, CAST(area2 AS BIGINT) AS area2
FROM ar, LATERAL (SELECT unnest(range(len(hx))) AS j) t
"""


def q_segment_buffer_pip(sf_dir: str):
    """Polygon-BUFFER constructor feeding the existing PIP machinery (turf
    ``buffer`` parity — the reference buffers conflation-map segments 5 m
    into geopoly polygons before the containment probe,
    ``ConflationMapDAO/loaders.js:104-113``): every consecutive event-point
    pair yields a rect buffer of radius 300 around a BOUNDED segment (the
    left point to a ±1000-clamped offset derived from the right point — the
    fixture's event points are pseudo-random, so raw consecutive-point
    segments span ~1/5 of the world each and every buffer would cover ~10 %
    of all probes, unlike any real 5 m buffer), built in
    DOUBLED coordinates with half-open odd bounds (lo = 2·min − 601,
    hi = 2·max + 601) so a doubled (even) probe coordinate can never land ON
    an (odd) edge — closed vs strict containment become indistinguishable
    and the BETWEEN oracle is exact. The buffer polys broadcast as the small
    side; customer probe points stream through the fused count probe."""
    from ..stages import segments
    from ..stages.spatial import _TileState, build_tile_index
    from ..stages.util import cached_state
    from ..stages.relational import partial_groupby_sum

    class _BufState(_TileState):
        """Doubled-coordinate world: the half-open parity trick doubles every
        coordinate, so the grid index must cover [0, 131072) — the default
        65536 world clips every right-half tile into the edge buckets and
        the probe degenerates to near-linear scans (measured 64 s → 1.3 s
        at sf0.1)."""

        def __init__(self, t: pa.Table):
            super().__init__(t)
            self.index = build_tile_index(t, world=131072)

    def _rects(uid: int, xy: np.ndarray):
        xyi = xy.astype(np.int64)
        out = []
        for i in range(len(xyi) - 1):
            dxb = int(xyi[i + 1, 0]) % 2001 - 1000
            dyb = int(xyi[i + 1, 1]) % 2001 - 1000
            out.append({"user_id": uid, "seg_i": np.int64(i + 1),
                        "tile_id": np.int64(uid) * 1024 + (i + 1),
                        "cx": np.int64(2 * int(xyi[i, 0]) + dxb),
                        "cy": np.int64(2 * int(xyi[i, 1]) + dyb),
                        "hw": np.int64(abs(dxb) + 601),
                        "hh": np.int64(abs(dyb) + 601)})
        return out

    segs = segments.per_shape(_event_shapes(sf_dir), _rects)
    # small-side materialization: one buffer rect per event-pair (~#events
    # rows, a few MB at sf0.1) — the documented broadcast pattern
    seg_pd = segs.to_pandas()
    seg_tab = pa.table({
        "tile_id": seg_pd["tile_id"].to_numpy().astype(np.int64),
        "ref_id": np.char.add("B", seg_pd["tile_id"].to_numpy().astype(str)),
        "level": np.zeros(len(seg_pd), dtype=np.int64),
        "cx": seg_pd["cx"].to_numpy().astype(np.int64),
        "cy": seg_pd["cy"].to_numpy().astype(np.int64),
        "hw": seg_pd["hw"].to_numpy().astype(np.int64),
        "hh": seg_pd["hh"].to_numpy().astype(np.int64),
    })
    ref = ray.put(seg_tab)

    cust = _rp(sf_dir, "customer", ["c_custkey"])

    def _probe(batch: pa.Table) -> pa.Table:
        st: _TileState = cached_state(ref, _BufState, token="_BufState")
        ck = batch["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        px = 2 * ((ck * 48271 + 11) % 65536)
        py = 2 * ((ck * 69621 + 77) % 65536)
        _pi, ti = st.index.query_points(px, py)
        counts = np.bincount(ti, minlength=len(st.index.tile_id))
        nz = np.flatnonzero(counts)
        return pa.table({"tile_id": st.index.tile_id[nz],
                         "n_inside": counts[nz].astype(np.int64)})

    partials = cust.map_batches(_probe, batch_format="pyarrow", batch_size=32768)
    agg = partial_groupby_sum(partials, ["tile_id"], ["n_inside"])

    def _unpack(t: pa.Table) -> pa.Table:
        tid = t["tile_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"user_id": tid // 1024, "seg_i": tid % 1024,
                         "n_inside": t["n_inside"]})

    return agg.map_batches(_unpack, batch_format="pyarrow")


# the world grid keeps coords < 65536, so doubled coords < 131072 and the
# rect bounds (odd) can never equal a doubled probe coord (even)
SQL_SEGMENT_BUFFER_PIP = """
WITH pts AS (
  SELECT user_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gi,
         CAST((event_id * 48271 + user_id * 977) % 65536 AS BIGINT) AS x,
         CAST((event_id * 69621 + 13) % 65536 AS BIGINT) AS y
  FROM events
),
segs AS (
  SELECT user_id, gi AS seg_i,
         2 * x + (nx % 2001 - 1000) AS cx, 2 * y + (ny % 2001 - 1000) AS cy,
         abs(nx % 2001 - 1000) + 601 AS hw, abs(ny % 2001 - 1000) + 601 AS hh
  FROM (SELECT user_id, gi, x, y,
               lead(x) OVER (PARTITION BY user_id ORDER BY gi) AS nx,
               lead(y) OVER (PARTITION BY user_id ORDER BY gi) AS ny
        FROM pts)
  WHERE nx IS NOT NULL
),
probes AS (
  SELECT 2 * ((c_custkey * 48271 + 11) % 65536) AS px,
         2 * ((c_custkey * 69621 + 77) % 65536) AS py
  FROM customer
)
SELECT s.user_id, CAST(s.seg_i AS BIGINT) AS seg_i,
       CAST(COUNT(*) AS BIGINT) AS n_inside
FROM segs s JOIN probes p
  ON p.px BETWEEN s.cx - s.hw AND s.cx + s.hw
 AND p.py BETWEEN s.cy - s.hh AND s.cy + s.hh
GROUP BY s.user_id, s.seg_i
"""


def q_segment_intersections(sf_dir: str):
    """Segment×segment intersection join (turf ``kinks``/``lineIntersect``
    parity — the reference's similarity scorer refuses self-intersecting
    LineStrings, ``getSimilarity.js:138-147``, so crossing detection gates
    its whole scoring path): every consecutive event-point pair yields a
    bounded trajectory segment (same ±1000 offsets as the buffer-PIP
    fixture); every customer yields a short probe segment; count, per
    trajectory segment, the probe segments it intersects — exact inclusive
    integer predicate, see ``spatial.segment_intersect_counts``."""
    from ..stages import segments
    from ..stages.spatial import segment_intersect_counts

    def _segs(uid: int, xy: np.ndarray):
        xyi = xy.astype(np.int64)
        out = []
        for i in range(len(xyi) - 1):
            dx = int(xyi[i + 1, 0]) % 2001 - 1000
            dy = int(xyi[i + 1, 1]) % 2001 - 1000
            out.append({"tile_id": np.int64(uid) * 1024 + (i + 1),
                        "ax": np.int64(xyi[i, 0]), "ay": np.int64(xyi[i, 1]),
                        "bx": np.int64(xyi[i, 0] + dx),
                        "by": np.int64(xyi[i, 1] + dy)})
        return out

    segs = segments.per_shape(_event_shapes(sf_dir), _segs)
    # small-side materialization: one segment per event pair (~#events rows,
    # a few MB at sf0.1) — the documented broadcast pattern
    seg_pd = segs.to_pandas()
    seg_tab = pa.table({c: seg_pd[c].to_numpy().astype(np.int64)
                        for c in ("tile_id", "ax", "ay", "bx", "by")})
    ref = ray.put(seg_tab)

    cust = _rp(sf_dir, "customer", ["c_custkey"])

    def _probes(batch: pa.Table) -> pa.Table:
        ck = batch["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        px = (ck * 48271 + 11) % 65536
        py = (ck * 69621 + 77) % 65536
        return pa.table({"px": px, "py": py,
                         "qx": px + (ck * 31 + 7) % 401 - 200,
                         "qy": py + (ck * 53 + 3) % 401 - 200})

    probes = cust.map_batches(_probes, batch_format="pyarrow", batch_size=32768)
    agg = segment_intersect_counts(probes, ref)

    def _unpack(t: pa.Table) -> pa.Table:
        tid = t["tile_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"user_id": tid // 1024, "seg_i": tid % 1024,
                         "n_cross": t["n_cross"]})

    return agg.map_batches(_unpack, batch_format="pyarrow")


# exact mirror: inclusive bbox overlap (bounds precomputed as CTE COLUMNS so
# the IEJoin condition is plain column comparisons — expressions like
# least()/sign() inside the join condition trip DuckDB 1.0's IEJoin with
# INTERNAL "requires a flat vector" at sf>=0.01 sizes) + the four
# orientation-SIGN predicates in an outer WHERE (signs compared, never the
# raw d1*d2 product — that reaches 2^70)
SQL_SEGMENT_INTERSECTIONS = """
WITH pts AS (
  SELECT user_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gi,
         CAST((event_id * 48271 + user_id * 977) % 65536 AS BIGINT) AS x,
         CAST((event_id * 69621 + 13) % 65536 AS BIGINT) AS y
  FROM events
),
segs AS (
  SELECT user_id, gi AS seg_i, x AS ax, y AS ay,
         x + (nx % 2001 - 1000) AS bx, y + (ny % 2001 - 1000) AS by,
         least(x, x + (nx % 2001 - 1000)) AS sx0,
         greatest(x, x + (nx % 2001 - 1000)) AS sx1,
         least(y, y + (ny % 2001 - 1000)) AS sy0,
         greatest(y, y + (ny % 2001 - 1000)) AS sy1
  FROM (SELECT user_id, gi, x, y,
               lead(x) OVER (PARTITION BY user_id ORDER BY gi) AS nx,
               lead(y) OVER (PARTITION BY user_id ORDER BY gi) AS ny
        FROM pts)
  WHERE nx IS NOT NULL
),
probes AS (
  SELECT px, py, px + (c_custkey * 31 + 7) % 401 - 200 AS qx,
                 py + (c_custkey * 53 + 3) % 401 - 200 AS qy,
         least(px, px + (c_custkey * 31 + 7) % 401 - 200) AS px0,
         greatest(px, px + (c_custkey * 31 + 7) % 401 - 200) AS px1,
         least(py, py + (c_custkey * 53 + 3) % 401 - 200) AS py0,
         greatest(py, py + (c_custkey * 53 + 3) % 401 - 200) AS py1
  FROM (SELECT (c_custkey * 48271 + 11) % 65536 AS px,
               (c_custkey * 69621 + 77) % 65536 AS py, c_custkey
        FROM customer)
),
cand AS (
  SELECT s.user_id, s.seg_i, s.ax, s.ay, s.bx, s.by, p.px, p.py, p.qx, p.qy
  FROM segs s JOIN probes p
    ON p.px0 <= s.sx1 AND p.px1 >= s.sx0 AND p.py0 <= s.sy1 AND p.py1 >= s.sy0
)
SELECT user_id, CAST(seg_i AS BIGINT) AS seg_i,
       CAST(COUNT(*) AS BIGINT) AS n_cross
FROM cand
WHERE sign((qx - px) * (ay - py) - (qy - py) * (ax - px))
    * sign((qx - px) * (by - py) - (qy - py) * (bx - px)) <= 0
  AND sign((bx - ax) * (py - ay) - (by - ay) * (px - ax))
    * sign((bx - ax) * (qy - ay) - (by - ay) * (qx - ax)) <= 0
GROUP BY user_id, seg_i
"""


def q_segment_tile_spans(sf_dir: str):
    """Segment×tile clip fan-out: per bounded trajectory segment (the same
    ±1000-offset consecutive-event segments as ``segment_intersections``),
    the count of tile rectangles the segment TRULY intersects — the
    fan-out every vector-tile emission computes before clipping (the
    engine's mbtiles sink, and the rect analog of the reference's
    buffered-geopoly probe, ``ConflationMapDAO/loaders.js:104-113``).
    Exact separating-axis predicate; no shuffle at all — see
    ``spatial.segment_rect_spans``. Tile rects here are re-centered into
    [8192, 57344) so every rect stays inside the world grid (the modular
    ``tiles`` fixture can straddle the world edge, which a clip fan-out
    must not)."""
    from ..stages import segments
    from ..stages.spatial import segment_rect_spans

    def _segs(uid: int, xy: np.ndarray):
        xyi = xy.astype(np.int64)
        out = []
        for i in range(len(xyi) - 1):
            dx = int(xyi[i + 1, 0]) % 2001 - 1000
            dy = int(xyi[i + 1, 1]) % 2001 - 1000
            out.append({"user_id": np.int64(uid), "seg_i": np.int64(i + 1),
                        "ax": np.int64(xyi[i, 0]), "ay": np.int64(xyi[i, 1]),
                        "bx": np.int64(xyi[i, 0] + dx),
                        "by": np.int64(xyi[i, 1] + dy)})
        return out

    segs = segments.per_shape(_event_shapes(sf_dir), _segs)

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_size"])
    pk = part["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    sz = part["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
    cx = 8192 + (pk * 40503 + sz * 257) % 49152
    cy = 8192 + (pk * 9973 + sz * 101) % 49152
    hw = 40 + (pk % 31) * 97
    hh = 40 + (pk % 23) * 131
    rects = ray.put(pa.table({"tile_id": pk, "x0": cx - hw, "x1": cx + hw,
                              "y0": cy - hh, "y1": cy + hh}))
    return segment_rect_spans(segs, rects, carry_cols=["user_id", "seg_i"])


# same IEJoin hygiene as SQL_SEGMENT_INTERSECTIONS: bbox bounds precomputed
# as CTE columns, the corner-sign conjunction in an outer WHERE
SQL_SEGMENT_TILE_SPANS = """
WITH pts AS (
  SELECT user_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gi,
         CAST((event_id * 48271 + user_id * 977) % 65536 AS BIGINT) AS x,
         CAST((event_id * 69621 + 13) % 65536 AS BIGINT) AS y
  FROM events
),
segs AS (
  SELECT user_id, gi AS seg_i, x AS ax, y AS ay,
         x + (nx % 2001 - 1000) AS bx, y + (ny % 2001 - 1000) AS by,
         least(x, x + (nx % 2001 - 1000)) AS sx0,
         greatest(x, x + (nx % 2001 - 1000)) AS sx1,
         least(y, y + (ny % 2001 - 1000)) AS sy0,
         greatest(y, y + (ny % 2001 - 1000)) AS sy1
  FROM (SELECT user_id, gi, x, y,
               lead(x) OVER (PARTITION BY user_id ORDER BY gi) AS nx,
               lead(y) OVER (PARTITION BY user_id ORDER BY gi) AS ny
        FROM pts)
  WHERE nx IS NOT NULL
),
tiles AS (
  SELECT p_partkey AS tile_id, cx - hw AS x0, cx + hw AS x1,
         cy - hh AS y0, cy + hh AS y1
  FROM (SELECT p_partkey,
               8192 + (p_partkey * 40503 + p_size * 257) % 49152 AS cx,
               8192 + (p_partkey * 9973 + p_size * 101) % 49152 AS cy,
               40 + (p_partkey % 31) * 97 AS hw,
               40 + (p_partkey % 23) * 131 AS hh
        FROM part)
),
cand AS (
  SELECT s.user_id, s.seg_i, s.ax, s.ay, s.bx, s.by, t.x0, t.x1, t.y0, t.y1
  FROM segs s JOIN tiles t
    ON t.x0 <= s.sx1 AND t.x1 >= s.sx0 AND t.y0 <= s.sy1 AND t.y1 >= s.sy0
)
SELECT user_id, CAST(seg_i AS BIGINT) AS seg_i,
       CAST(COUNT(*) AS BIGINT) AS n_tiles
FROM cand
WHERE NOT ((bx-ax)*(y0-ay) - (by-ay)*(x0-ax) > 0
       AND (bx-ax)*(y0-ay) - (by-ay)*(x1-ax) > 0
       AND (bx-ax)*(y1-ay) - (by-ay)*(x0-ax) > 0
       AND (bx-ax)*(y1-ay) - (by-ay)*(x1-ax) > 0)
  AND NOT ((bx-ax)*(y0-ay) - (by-ay)*(x0-ax) < 0
       AND (bx-ax)*(y0-ay) - (by-ay)*(x1-ax) < 0
       AND (bx-ax)*(y1-ay) - (by-ay)*(x0-ax) < 0
       AND (bx-ax)*(y1-ay) - (by-ay)*(x1-ax) < 0)
GROUP BY user_id, seg_i
"""


def q_hilbert_cells(sf_dir: str):
    """Hilbert-curve locality layout: every probe point gets its 32-bit
    Hilbert distance (``cells.hilbert_d`` — the strictly-better-than-Morton
    locality key the engine offers for data clustering, the Z-ORDER/space-
    filling-curve layout step of a lakehouse writer), then buckets by the
    top 8 bits. Per bucket: count, exact sum, min and max of the Hilbert
    keys — partial-combined per batch, so the shuffle is 256-bucket-sized
    regardless of input. Oracle: the same 16-level bit transform as a
    recursive CTE."""
    from ..functions import cells
    from ..stages.relational import bucketed_groups

    li = _rp(sf_dir, "lineitem",
             ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
              "l_quantity"])

    def _part(df: pd.DataFrame) -> pd.DataFrame:
        t = td.points_batch(pa.Table.from_pandas(df, preserve_index=False))
        d = cells.hilbert_d(t["px"].to_numpy(), t["py"].to_numpy())
        b = d >> 24
        o = np.argsort(b, kind="stable")
        bs, ds = b[o], d[o]
        starts = np.flatnonzero(np.r_[True, bs[1:] != bs[:-1]])
        return pd.DataFrame({
            "bucket": bs[starts],
            "n_points": np.diff(np.r_[starts, len(bs)]).astype(np.int64),
            "sum_d": np.add.reduceat(ds, starts),
            "min_d": np.minimum.reduceat(ds, starts),
            "max_d": np.maximum.reduceat(ds, starts),
        })

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("bucket", as_index=False, sort=False).agg(
            n_points=("n_points", "sum"), sum_d=("sum_d", "sum"),
            min_d=("min_d", "min"), max_d=("max_d", "max"))

    return bucketed_groups(li, ["bucket"], _final, pre_fn=_part, n_buckets=16)


SQL_HILBERT_CELLS = f"""
WITH RECURSIVE pts AS ({td.POINTS_SQL}),
hil AS (
  SELECT px AS x, py AS y, CAST(0 AS BIGINT) AS d, CAST(32768 AS BIGINT) AS s
  FROM pts
  UNION ALL
  SELECT CASE WHEN ry = 1 THEN x WHEN rx = 1 THEN s - 1 - y ELSE y END,
         CASE WHEN ry = 1 THEN y WHEN rx = 1 THEN s - 1 - x ELSE x END,
         d + s * s * xor(3 * rx, ry),
         s // 2
  FROM (SELECT x, y, d, s,
               CASE WHEN (x & s) > 0 THEN 1 ELSE 0 END AS rx,
               CASE WHEN (y & s) > 0 THEN 1 ELSE 0 END AS ry
        FROM hil WHERE s > 0) h
)
SELECT d >> 24 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(SUM(d) AS BIGINT) AS sum_d, MIN(d) AS min_d, MAX(d) AS max_d
FROM hil WHERE s = 0 GROUP BY 1
"""


def q_shape_rotfrechet(sf_dir: str):
    """Rotation-restricted curve similarity (reference
    ``scoreChosenPaths/frechet.js:8-35``, ``restrictRotationAngle 0.1π``):
    min discrete-Fréchet² over the 9-angle rational-matrix sweep — see
    ``stages.segments.shape_rotfrechet_halves``."""
    from ..stages import segments

    return segments.shape_rotfrechet_halves(_event_shapes(sf_dir))


# Rotation sweep: the 9 (ang, cos, sin)*1024 integer matrices of
# stages/segments.py::ROT_CS embedded verbatim; halves stride-picked to 32,
# translated to their first vertex, half B rotated per angle, then the SAME
# anti-diagonal Fréchet DP as SQL_SHAPE_FRECHET keyed on (user_id, ang);
# best row = min (score, ang).
SQL_SHAPE_ROTFRECHET = "WITH RECURSIVE " + _SQL_SHAPE_PTS + """,
halves AS (
  SELECT p.user_id,
         list(p.x ORDER BY p.gi) FILTER (WHERE p.gi <= n.n // 2) AS ax,
         list(p.y ORDER BY p.gi) FILTER (WHERE p.gi <= n.n // 2) AS ay,
         list(p.x ORDER BY p.gi) FILTER (WHERE p.gi > n.n // 2) AS bx,
         list(p.y ORDER BY p.gi) FILTER (WHERE p.gi > n.n // 2) AS "by"
  FROM pts p JOIN nn n USING (user_id) WHERE n.n >= 4
  GROUP BY p.user_id
),
picked0 AS (  -- stride_pick to 32 vertices per half (exact index selection)
  SELECT user_id,
         [ax[1 + _j * (len(ax) - 1) // 31] FOR _j IN range(32)] AS pax,
         [ay[1 + _j * (len(ay) - 1) // 31] FOR _j IN range(32)] AS pay,
         [bx[1 + _j * (len(bx) - 1) // 31] FOR _j IN range(32)] AS pbx,
         ["by"[1 + _j * (len("by") - 1) // 31] FOR _j IN range(32)] AS pby
  FROM halves
),
angles AS (SELECT * FROM (VALUES (-4, 974, -316), (-3, 996, -239),
                                 (-2, 1011, -160), (-1, 1021, -80),
                                 (0, 1024, 0), (1, 1021, 80), (2, 1011, 160),
                                 (3, 996, 239), (4, 974, 316)) t(ang, c, s)),
picked AS MATERIALIZED (  -- translate to first vertex; rotate half B
  SELECT p.user_id, a.ang,
         [ (p.pax[i+1] - p.pax[1]) * 1024 FOR i IN range(32) ] AS pax,
         [ (p.pay[i+1] - p.pay[1]) * 1024 FOR i IN range(32) ] AS pay,
         [ (p.pbx[i+1] - p.pbx[1]) * a.c - (p.pby[i+1] - p.pby[1]) * a.s
           FOR i IN range(32) ] AS pbx,
         [ (p.pbx[i+1] - p.pbx[1]) * a.s + (p.pby[i+1] - p.pby[1]) * a.c
           FOR i IN range(32) ] AS pby
  FROM picked0 p CROSS JOIN angles a
),
fr AS (  -- discrete-Fréchet DP by anti-diagonals, keyed on (user_id, ang)
  SELECT user_id, ang, 0 AS k,
         [(pax[1] - pbx[1]) * (pax[1] - pbx[1])
          + (pay[1] - pby[1]) * (pay[1] - pby[1])] AS cur,
         CAST(NULL AS BIGINT[]) AS prev,
         pax, pay, pbx, pby
  FROM picked
  UNION ALL
  SELECT user_id, ang, k + 1,
         [ greatest(
             (pax[_i + 1] - pbx[k + 1 - _i + 1]) * (pax[_i + 1] - pbx[k + 1 - _i + 1])
             + (pay[_i + 1] - pby[k + 1 - _i + 1]) * (pay[_i + 1] - pby[k + 1 - _i + 1]),
             least(
               COALESCE(cur[_i - greatest(0, k - 31) + 1], 36893488147419103232),
               COALESCE(cur[_i - 1 - greatest(0, k - 31) + 1], 36893488147419103232),
               COALESCE(prev[_i - 1 - greatest(0, k - 1 - 31) + 1], 36893488147419103232)
             )
           )
           FOR _i IN range(greatest(0, k + 1 - 31), least(k + 1, 31) + 1) ] AS cur,
         cur AS prev, pax, pay, pbx, pby
  FROM fr WHERE k < 62
),
best AS (
  SELECT user_id, ang, cur[1] AS f,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY cur[1], ang) AS rn
  FROM fr WHERE k = 62
)
SELECT n.user_id,
       CAST(CASE WHEN n.n < 4 THEN -1 ELSE b.f END AS BIGINT) AS rot_frechet_sq,
       CAST(CASE WHEN n.n < 4 THEN 0 ELSE b.ang END AS BIGINT) AS best_rot
FROM nn n LEFT JOIN (SELECT user_id, f, ang FROM best WHERE rn = 1) b USING (user_id)
"""


def q_shape_hausdorff(sf_dir: str):
    from ..stages import segments

    return segments.shape_hausdorff_halves(_event_shapes(sf_dir))


# Symmetric discrete Hausdorff between the two halves of each shape: a plain
# max-of-min over the integer d² cross matrix — exactly the engine kernel
# (stages/segments.shape_hausdorff_halves), no float ops anywhere.
SQL_SHAPE_HAUSDORFF = "WITH " + _SQL_SHAPE_PTS + """,
d AS (
  SELECT a.user_id, a.gi AS ga, b.gi AS gb,
         (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
  FROM pts a
  JOIN nn n ON n.user_id = a.user_id
  JOIN pts b ON b.user_id = a.user_id
  WHERE n.n >= 4 AND a.gi <= n.n // 2 AND b.gi > n.n // 2
),
hab AS (SELECT user_id, MAX(m) AS h
        FROM (SELECT user_id, ga, MIN(d2) AS m FROM d GROUP BY user_id, ga)
        GROUP BY user_id),
hba AS (SELECT user_id, MAX(m) AS h
        FROM (SELECT user_id, gb, MIN(d2) AS m FROM d GROUP BY user_id, gb)
        GROUP BY user_id)
SELECT n.user_id,
       CAST(COALESCE(a.h, -1) AS BIGINT) AS h_ab_sq,
       CAST(COALESCE(b.h, -1) AS BIGINT) AS h_ba_sq,
       CAST(COALESCE(greatest(a.h, b.h), -1) AS BIGINT) AS hausdorff_sq
FROM nn n
LEFT JOIN hab a USING (user_id)
LEFT JOIN hba b USING (user_id)
"""


def q_shape_simplify(sf_dir: str):
    from ..stages import segments

    return segments.shape_simplify_stats(_event_shapes(sf_dir))


SQL_SHAPE_SIMPLIFY = "WITH RECURSIVE " + _SQL_SHAPE_PTS + "," + _sql_rdp(250000) + """,
simp AS (SELECT k.user_id, p.gi, p.x, p.y,
                ROW_NUMBER() OVER (PARTITION BY k.user_id ORDER BY p.gi) AS si
         FROM keep k JOIN pts p USING (user_id, gi)),
slen AS (
  SELECT user_id,
         CAST(FLOOR(sqrt(CAST((nx - x)*(nx - x) + (ny - y)*(ny - y) AS DOUBLE)) * 100 + 0.5) AS BIGINT) AS len_c
  FROM (SELECT user_id, x, y,
               lead(x) OVER (PARTITION BY user_id ORDER BY si) AS nx,
               lead(y) OVER (PARTITION BY user_id ORDER BY si) AS ny
        FROM simp)
  WHERE nx IS NOT NULL
),
ksz AS (SELECT user_id, COUNT(*) AS n_simplified FROM keep GROUP BY user_id),
tl AS (SELECT user_id, CAST(SUM(len_c) AS BIGINT) AS length_c FROM segs GROUP BY user_id),
sl AS (SELECT user_id, CAST(SUM(len_c) AS BIGINT) AS simplified_length_c FROM slen GROUP BY user_id)
SELECT n.user_id, n.n AS n_points,
       CAST(k.n_simplified AS BIGINT) AS n_simplified,
       COALESCE(t.length_c, 0) AS length_c,
       COALESCE(s.simplified_length_c, 0) AS simplified_length_c
FROM nn n JOIN ksz k USING (user_id)
LEFT JOIN tl t USING (user_id) LEFT JOIN sl s USING (user_id)
"""


def q_shape_slices(sf_dir: str):
    from ..stages import segments

    return segments.shape_slices(_event_shapes(sf_dir))


SQL_SHAPE_SLICES = "WITH " + _SQL_SHAPE_PTS + """,
cumv AS (
  SELECT p.user_id, p.gi,
         CAST(COALESCE(SUM(s.len_c), 0) AS BIGINT) AS cum
  FROM pts p LEFT JOIN segs s ON s.user_id = p.user_id AND s.gi < p.gi
  GROUP BY p.user_id, p.gi
),
tot AS (SELECT user_id, MAX(cum) AS total FROM cumv GROUP BY user_id),
sl AS (
  SELECT t.user_id, CAST(i.i AS BIGINT) AS slice_idx,
         t.total * i.i // 3 AS a, t.total * (i.i + 1) // 3 AS b
  FROM tot t, (SELECT unnest(range(3)) AS i) i
),
bounds AS (
  SELECT s.user_id, s.slice_idx,
         (SELECT MIN(c.gi) FROM cumv c WHERE c.user_id = s.user_id AND c.cum >= s.a) AS sv,
         (SELECT MIN(c.gi) FROM cumv c WHERE c.user_id = s.user_id AND c.cum >= s.b) AS ev
  FROM sl s
)
SELECT b.user_id, b.slice_idx,
       CAST(ce.cum - cs.cum AS BIGINT) AS slice_len_c,
       CAST(b.ev - b.sv + 1 AS BIGINT) AS n_vertices
FROM bounds b
JOIN cumv cs ON cs.user_id = b.user_id AND cs.gi = b.sv
JOIN cumv ce ON ce.user_id = b.user_id AND ce.gi = b.ev
"""


def q_shape_snap_stats(sf_dir: str):
    from ..stages import segments

    return segments.shape_snap_stats(_event_shapes(sf_dir))


SQL_SHAPE_SNAP_STATS = "WITH RECURSIVE " + _SQL_SHAPE_PTS + "," + _sql_dev(640000) + """,
devq AS (SELECT user_id, gi, CAST(FLOOR(sqrt(d2) * 100 + 0.5) AS BIGINT) AS dev_c FROM dev),
rk AS (SELECT user_id, dev_c, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY dev_c) AS rn
       FROM devq),
agg AS (SELECT user_id, CAST(SUM(dev_c) AS BIGINT) AS sum_dev_c FROM devq GROUP BY user_id),
p90 AS (SELECT r.user_id, r.dev_c AS p90_c
        FROM rk r JOIN nn ON nn.user_id = r.user_id
        WHERE r.rn = (9 * nn.n + 9) // 10)
SELECT n.user_id, n.n AS n_points,
       CASE WHEN n.n < 4 THEN -1 ELSE a.sum_dev_c END AS sum_dev_c,
       CASE WHEN n.n < 4 THEN -1 ELSE p.p90_c END AS p90_c
FROM nn n LEFT JOIN agg a USING (user_id) LEFT JOIN p90 p USING (user_id)
"""


def q_shape_bearing_split(sf_dir: str):
    from ..stages import segments

    return segments.shape_bearing_splits(_event_shapes(sf_dir))


SQL_SHAPE_BEARING_SPLIT = "WITH " + _SQL_SHAPE_PTS + """,
vecs AS (
  SELECT user_id, gi,
         x - lag(x) OVER w AS ax, y - lag(y) OVER w AS ay,
         lead(x) OVER w - x AS bx, lead(y) OVER w - y AS by
  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY gi)
),
flags AS (  -- turn at vertex gi sharper than 60° starts a new part there
  SELECT user_id, gi,
         CASE WHEN ax IS NULL OR bx IS NULL THEN 0
              WHEN ax*ax + ay*ay = 0 OR bx*bx + by*by = 0 THEN 0
              WHEN ax*bx + ay*by < 0 THEN 1
              WHEN 4 * (CAST(ax*bx + ay*by AS DOUBLE) * CAST(ax*bx + ay*by AS DOUBLE))
                   < CAST(ax*ax + ay*ay AS DOUBLE) * CAST(bx*bx + by*by AS DOUBLE) THEN 1
              ELSE 0 END AS cut
  FROM vecs
),
parts AS (
  SELECT s.user_id, s.gi, s.len_c,
         CAST(COALESCE(SUM(f.cut), 0) AS BIGINT) AS part
  FROM segs s LEFT JOIN flags f ON f.user_id = s.user_id AND f.gi <= s.gi
  GROUP BY s.user_id, s.gi, s.len_c
),
plen AS (SELECT user_id, part, CAST(SUM(len_c) AS BIGINT) AS plen
         FROM parts GROUP BY user_id, part),
agg AS (SELECT user_id, COUNT(*) AS n_parts, MAX(plen) AS longest
        FROM plen GROUP BY user_id)
SELECT n.user_id,
       CAST(COALESCE(a.n_parts, 1) AS BIGINT) AS n_parts,
       CAST(COALESCE(a.longest, 0) AS BIGINT) AS longest_part_len_c
FROM nn n LEFT JOIN agg a USING (user_id)
"""


def q_shape_cospatiality(sf_dir: str):
    from ..stages import segments

    return segments.shape_cospatiality(_event_shapes(sf_dir))


SQL_SHAPE_COSPATIALITY = "WITH RECURSIVE " + _SQL_SHAPE_PTS + "," + _sql_dev(1440000) + """,
near AS (SELECT user_id, gi, CASE WHEN d2 <= 160000.0 THEN 1 ELSE 0 END AS nr FROM dev),
cosp AS (  -- a segment is cospatial iff both endpoints lie in the buffer
  SELECT s.user_id, s.gi, s.len_c, n1.nr * n2.nr AS c,
         LAG(n1.nr * n2.nr, 1, 0) OVER (PARTITION BY s.user_id ORDER BY s.gi) AS pc
  FROM segs s
  JOIN near n1 ON n1.user_id = s.user_id AND n1.gi = s.gi
  JOIN near n2 ON n2.user_id = s.user_id AND n2.gi = s.gi + 1
),
agg AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN c = 1 AND pc = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_intervals,
         CAST(SUM(CASE WHEN c = 1 THEN len_c ELSE 0 END) AS BIGINT) AS overlap_c
  FROM cosp GROUP BY user_id
)
SELECT n.user_id, CAST(COALESCE(a.n_intervals, 0) AS BIGINT) AS n_intervals,
       CAST(COALESCE(a.overlap_c, 0) AS BIGINT) AS overlap_c
FROM nn n LEFT JOIN agg a USING (user_id)
"""


def q_shape_merge_roundtrip(sf_dir: str):  # exact oracle (sentinel-guarded)
    from ..stages import segments

    return segments.shape_merge_roundtrip(_event_shapes(sf_dir))


# slice at vertices n//3 and 2n//3 (gi is 1-based), middle chunk jittered +4x
# for uid%5==0; merge branches: 1 part unjittered, 3 jittered. An accidental
# endpoint coincidence (the 4 non-construction directed end->start pairs)
# emits the -1 sentinel on BOTH sides — see stages/segments.py docstring.
SQL_SHAPE_MERGE_ROUNDTRIP = "WITH " + _SQL_SHAPE_PTS + """,
tot AS (SELECT user_id, CAST(SUM(len_c) AS BIGINT) AS total FROM segs GROUP BY user_id),
e AS (
  SELECT nn.user_id, nn.n, COALESCE(t.total, 0) AS total,
         p0.x AS x0, p0.y AS y0,
         p1.x AS xk1, p1.y AS yk1,
         p2.x AS xk2, p2.y AS yk2,
         p3.x AS xn, p3.y AS yn,
         CASE WHEN nn.user_id % 5 = 0 THEN 4 ELSE 0 END AS j
  FROM nn
  LEFT JOIN tot t USING (user_id)
  LEFT JOIN pts p0 ON p0.user_id = nn.user_id AND p0.gi = 1
  LEFT JOIN pts p1 ON p1.user_id = nn.user_id AND p1.gi = nn.n // 3 + 1
  LEFT JOIN pts p2 ON p2.user_id = nn.user_id AND p2.gi = (2 * nn.n) // 3 + 1
  LEFT JOIN pts p3 ON p3.user_id = nn.user_id AND p3.gi = nn.n
),
u AS (
  SELECT *,
         n >= 4 AND (
              (xk1 = xk2 AND yk1 = yk2)        -- a.end -> c.start
           OR (xk2 + j = x0 AND yk2 = y0)      -- b.end -> a.start
           OR (xn = x0 AND yn = y0)            -- c.end -> a.start
           OR (xn = xk1 + j AND yn = yk1)      -- c.end -> b.start
         ) AS coincident
  FROM e
)
SELECT user_id,
       CAST(CASE WHEN n < 2 THEN 0
                 WHEN n < 4 THEN 1
                 WHEN coincident THEN -1
                 WHEN user_id % 5 = 0 THEN 3
                 ELSE 1 END AS BIGINT) AS merged_parts,
       CAST(CASE WHEN n < 2 THEN 0
                 WHEN coincident AND n >= 4 THEN -1
                 ELSE total END AS BIGINT) AS merged_len_q2
FROM u
"""


def q_stop_fit(sf_dir: str):
    from ..stages import segments

    return segments.stop_fit(_event_shapes(sf_dir))


SQL_STOP_FIT = "WITH RECURSIVE " + _SQL_SHAPE_PTS + """,
cumv AS (
  SELECT p.user_id, p.gi,
         CAST(COALESCE(SUM(s.len_c), 0) AS BIGINT) AS cum
  FROM pts p LEFT JOIN segs s ON s.user_id = p.user_id AND s.gi < p.gi
  GROUP BY p.user_id, p.gi
),
kk AS (SELECT user_id, n, greatest(1, n // 8) AS k FROM nn WHERE n >= 3),
stops AS (  -- every k-th vertex, deterministically integer-jittered
  SELECT k.user_id, CAST(i.i AS BIGINT) AS stop_idx,
         p.x + (i.i * 2654435761 + k.user_id) % 7 - 3 AS sx,
         p.y + (i.i * 2654435761 + k.user_id) % 7 - 3 AS sy
  FROM kk k, (SELECT unnest(range(8)) AS i) i
  JOIN pts p ON p.user_id = k.user_id AND p.gi = 1 + i.i * k.k
  WHERE 1 + i.i * k.k <= k.n
),
fit AS (  -- greedy monotonic: argmin d² over vertices at/after prev choice
  SELECT s.user_id, s.stop_idx,
         max_by(p.gi, -(((p.x - s.sx) * (p.x - s.sx) + (p.y - s.sy) * (p.y - s.sy)) * 1048576 + p.gi)) AS v,
         CAST(MIN((p.x - s.sx) * (p.x - s.sx) + (p.y - s.sy) * (p.y - s.sy)) AS BIGINT) AS dev_sq
  FROM stops s JOIN pts p ON p.user_id = s.user_id
  WHERE s.stop_idx = 0
  GROUP BY s.user_id, s.stop_idx
  UNION ALL
  SELECT s.user_id, s.stop_idx,
         max_by(p.gi, -(((p.x - s.sx) * (p.x - s.sx) + (p.y - s.sy) * (p.y - s.sy)) * 1048576 + p.gi)) AS v,
         CAST(MIN((p.x - s.sx) * (p.x - s.sx) + (p.y - s.sy) * (p.y - s.sy)) AS BIGINT) AS dev_sq
  FROM fit f
  JOIN stops s ON s.user_id = f.user_id AND s.stop_idx = f.stop_idx + 1
  JOIN pts p ON p.user_id = s.user_id AND p.gi >= f.v
  GROUP BY s.user_id, s.stop_idx
)
SELECT f.user_id, f.stop_idx, c.cum AS along_c, f.dev_sq
FROM fit f JOIN cumv c ON c.user_id = f.user_id AND c.gi = f.v
"""


# ---------------------------------------------------------------------------
# unit normalizer (M17), redundancy removal (D4), dow expansion (J10),
# subsequence containment (D6), LSH-ANN scale path
# ---------------------------------------------------------------------------

_UNIT_FACTORS = [("ft", 3280.839895013123), ("km", 1.0), ("m", 1000.0),
                 ("mi", 0.6213711922373339)]


def q_unit_normalize(sf_dir: str):
    """Mixed-unit distance normalizer: each shape reports its length in one
    of {km, m, mi, ft}; recover the unit by argmin deviation against the
    computed length — ≙ M17 shape_dist_traveled unit inference
    (``/root/reference/src/daos/GeoJsonGtfsDAO/generators.js:19-94``)."""
    from ..stages import segments

    stats = segments.shape_stats(_event_shapes(sf_dir))

    def _norm(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        true_km = batch["length_c"].to_numpy(zero_copy_only=False) / 100.0 / 1000.0
        # per-shape "reported" unit cycles with user_id (same CASE as the SQL)
        fsel = np.array([f for _, f in _UNIT_FACTORS])[uid % 4]
        reported = true_km * fsel
        best_dev = np.full(len(uid), np.inf)
        best_unit = np.empty(len(uid), dtype=object)
        best_norm = np.zeros(len(uid))
        for u, f in sorted(_UNIT_FACTORS):  # deterministic unit-name order
            norm = reported / f
            dev = np.abs(norm - true_km)
            take = dev < best_dev
            best_dev = np.where(take, dev, best_dev)
            best_norm = np.where(take, norm, best_norm)
            best_unit[take] = u
        return pa.table(
            {
                "user_id": uid,
                "unit": pa.array(list(best_unit), type=pa.string()),
                "norm_km_q6": cents(best_norm, 1000000),
            }
        )

    return stats.map_batches(_norm, batch_format="pyarrow")


SQL_UNIT_NORMALIZE = """
WITH o AS (
  SELECT user_id, ex, ey,
         lag(ex) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS px,
         lag(ey) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS py
  FROM (SELECT user_id, ts, event_id,
               (event_id * 48271 + user_id * 977) % 65536 AS ex,
               (event_id * 69621 + 13) % 65536 AS ey FROM events)
),
s AS (
  SELECT user_id,
         CAST(COALESCE(SUM(CASE WHEN px IS NULL THEN NULL ELSE
           CAST(FLOOR(sqrt(CAST((ex - px) * (ex - px) + (ey - py) * (ey - py) AS DOUBLE)) * 100 + 0.5) AS BIGINT)
         END), 0) AS BIGINT) AS length_c
  FROM o GROUP BY user_id
),
rep AS (
  SELECT user_id, length_c / 100.0 / 1000.0 AS true_km,
         length_c / 100.0 / 1000.0 *
         CASE user_id % 4 WHEN 0 THEN 3280.839895013123 WHEN 1 THEN 1.0
                          WHEN 2 THEN 1000.0 ELSE 0.6213711922373339 END AS reported
  FROM s
),
cand AS (
  SELECT user_id, u.u AS unit, rep.reported / u.f AS norm_km,
         abs(rep.reported / u.f - rep.true_km) AS dev
  FROM rep CROSS JOIN (VALUES ('ft', 3280.839895013123), ('km', 1.0),
                              ('m', 1000.0), ('mi', 0.6213711922373339)) u(u, f)
)
SELECT user_id, unit, CAST(FLOOR(norm_km * 1000000 + 0.5) AS BIGINT) AS norm_km_q6
FROM (SELECT user_id, unit, norm_km,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY dev, unit) AS rn
      FROM cand)
WHERE rn = 1
"""


def q_redundant_candidates(sf_dir: str):
    """Per probe point, drop candidate tiles whose rectangle is strictly
    covered by another candidate's rectangle — ≙ D4 redundant-match removal
    (``SharedStreetsMatcher/removeRedundantMatches.js:4-85``). Keep rule:
    drop A when a candidate B contains A's rect and (area_B > area_A or
    equal-area tie-break by smaller tile_id)."""
    from ..stages.spatial import _TileState

    pts = conflation.read_points(sf_dir)
    tiles = td.tiles_table(sf_dir)

    # Key reduction: if B's rect contains A's rect, then any point inside A
    # is inside B too — so "B is also a candidate of the point" always holds
    # and dominance is a pure TILE-level property. The tile self-join is
    # DISTRIBUTED (tile blocks probe the broadcast index in parallel); only
    # the small dominated-id set returns to the driver — at a multi-million-
    # tile reference side a single-threaded driver pass would be the wall.
    from ..stages.util import cached_state

    ref_full = ray.put(tiles)

    def _dominated_ids(batch: pa.Table) -> pa.Table:
        st0: _TileState = cached_state(ref_full, _TileState)
        ix = st0.index
        cx = batch["cx"].to_numpy(zero_copy_only=False).astype(np.int64)
        cy = batch["cy"].to_numpy(zero_copy_only=False).astype(np.int64)
        hw = batch["hw"].to_numpy(zero_copy_only=False).astype(np.int64)
        hh = batch["hh"].to_numpy(zero_copy_only=False).astype(np.int64)
        tid = batch["tile_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x0, y0, x1, y1 = cx - hw, cy - hh, cx + hw, cy + hh
        qi, ti = ix.query_rects(x0, y0, x1, y1)
        area_q = (x1 - x0) * (y1 - y0)
        area_c = (ix.x1 - ix.x0) * (ix.y1 - ix.y0)
        strict = (
            (ix.x0[ti] <= x0[qi]) & (ix.y0[ti] <= y0[qi])
            & (ix.x1[ti] >= x1[qi]) & (ix.y1[ti] >= y1[qi])
            & (ix.tile_id[ti] != tid[qi])
            & ((area_c[ti] > area_q[qi])
               | ((area_c[ti] == area_q[qi]) & (ix.tile_id[ti] < tid[qi])))
        )
        return pa.table({"tile_id": np.unique(tid[qi[strict]])})

    dom_ids = np.sort(
        ray.data.from_arrow(tiles)
        .map_batches(_dominated_ids, batch_format="pyarrow", batch_size=2048)
        .to_pandas()["tile_id"].to_numpy()
    )
    all_ids = tiles["tile_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    pos = np.clip(np.searchsorted(dom_ids, all_ids), 0, max(len(dom_ids) - 1, 0))
    dominated = (dom_ids[pos] == all_ids) if len(dom_ids) else np.zeros(len(all_ids), bool)
    # a dominated tile contributes NOTHING to the output, so the probe index
    # holds only the surviving tiles — every batch probes a smaller grid and
    # the dominated-mask lookup disappears from the hot path entirely
    ref = ray.put(tiles.filter(pa.array(~dominated)))

    def _filter_and_count(batch: pa.Table) -> pa.Table:
        # combiner pushed into the probe: emit per-batch (tile_id, n_kept)
        # partials instead of ~30 pair rows per point (the pair set never
        # materializes; only tiny partials shuffle)
        from ..stages.util import cached_state

        st: _TileState = cached_state(ref, _TileState)
        ix = st.index
        px = batch["px"].to_numpy(zero_copy_only=False).astype(np.int64)
        py = batch["py"].to_numpy(zero_copy_only=False).astype(np.int64)
        pi, ti = ix.query_points(px, py)
        # bincount over tile INDEX (no sort) instead of np.unique
        cnt = np.bincount(ti, minlength=len(ix.x0))
        nz = np.flatnonzero(cnt)
        return pa.table({"tile_id": ix.tile_id[nz], "n_kept": cnt[nz].astype(np.int64)})

    partials = pts.map_batches(_filter_and_count, batch_format="pyarrow", batch_size=32768)
    return rel.partial_groupby_sum(partials, ["tile_id"], ["n_kept"])


SQL_REDUNDANT_CANDIDATES = _CTES + """
, pairs AS (
  SELECT p.point_id, t.tile_id,
         t.cx - t.hw AS x0, t.cy - t.hh AS y0, t.cx + t.hw AS x1, t.cy + t.hh AS y1,
         4 * t.hw * t.hh AS area
  FROM points p JOIN tiles t
    ON p.px BETWEEN t.cx - t.hw AND t.cx + t.hw
   AND p.py BETWEEN t.cy - t.hh AND t.cy + t.hh
)
SELECT tile_id, COUNT(*) AS n_kept FROM (
  SELECT a.point_id, a.tile_id FROM pairs a
  WHERE NOT EXISTS (
    SELECT 1 FROM pairs b
    WHERE b.point_id = a.point_id AND b.tile_id <> a.tile_id
      AND b.x0 <= a.x0 AND b.y0 <= a.y0 AND b.x1 >= a.x1 AND b.y1 >= a.y1
      AND (b.area > a.area OR (b.area = a.area AND b.tile_id < a.tile_id))
  )
) GROUP BY tile_id
"""


def q_order_dow_counts(sf_dir: str):
    """Orders per day-of-week (0=Sunday) — ≙ J10 calendar dow-membership
    (``GtfsScheduledTrafficDAO/createTableFns.js:395-457``). dow computed
    with engine-identical integer arithmetic (1970-01-01 = Thursday)."""
    orders = _rp(sf_dir, "orders", ["o_orderdate"])

    def _dow(batch: pa.Table) -> pa.Table:
        us = batch["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"dow": ((us // 86400000000) + 4) % 7})

    d = orders.map_batches(_dow, batch_format="pyarrow", batch_size=8192)
    return rel.partial_groupby_sum(d, ["dow"], [], count_as="n_orders")


SQL_ORDER_DOW_COUNTS = """
SELECT ((epoch_us(o_orderdate) // 86400000000) + 4) % 7 AS dow, COUNT(*) AS n_orders
FROM orders GROUP BY 1
"""


_CONTAINMENT_BLOCK_CAP = 4096


def q_doc_containment(sf_dir: str):
    """Pairs (a, b) in the same (lang, source) block where a's token SET is
    contained in b's — ≙ D6/isSubset redundancy detection
    (``src/utils/stringAlgorithms.js:9-60``). Blocked grouped compare;
    ASCII ``\\w`` tokenization matches the DuckDB ``list_has_all`` oracle.

    Scale guards: the pairwise stage works on 64-bit word-hash sets with a
    Bloom-style OR-mask prefilter (``mask_a & ~mask_b == 0`` is necessary for
    containment — one vectorized bitwise matrix kills almost every pair
    before any real subset test), and a hot block is capped at
    ``_CONTAINMENT_BLOCK_CAP`` docs (keep smallest doc_ids; truncation
    logged, never silent)."""
    import logging

    from ..functions.text import _WORD_ASCII_RE, fnv1a64_batch

    docs = _rp(sf_dir, "documents", ["doc_id", "text", "lang", "source"])

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for (_, _), grp in g.groupby(["lang", "source"], sort=False):
            if len(grp) > _CONTAINMENT_BLOCK_CAP:
                logging.getLogger(__name__).warning(
                    "doc_containment: block capped %d -> %d docs",
                    len(grp), _CONTAINMENT_BLOCK_CAP,
                )
                grp = grp.sort_values("doc_id").head(_CONTAINMENT_BLOCK_CAP)
            ids = grp["doc_id"].to_numpy()
            n = len(ids)
            hsets = []
            for t in grp["text"]:
                ws = list({w.lower() for w in _WORD_ASCII_RE.findall(t)})
                hsets.append(np.sort(fnv1a64_batch(ws)))
            sizes = np.array([len(h) for h in hsets], dtype=np.int64)
            masks = np.array(
                [np.bitwise_or.reduce(np.uint64(1) << (h % np.uint64(64)), initial=np.uint64(0))
                 for h in hsets],
                dtype=np.uint64,
            )
            # necessary conditions, all vectorized: non-empty a, |a| <= |b|,
            # bloom mask containment, i != j
            ok = (
                (sizes[:, None] > 0)
                & (sizes[:, None] <= sizes[None, :])
                & ((masks[:, None] & ~masks[None, :]) == np.uint64(0))
                & ~np.eye(n, dtype=bool)
            )
            for i, j in zip(*np.nonzero(ok)):
                a, b = hsets[i], hsets[j]
                pos = np.searchsorted(b, a)
                if np.all(pos < len(b)) and np.array_equal(b[pos], a):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        return pd.DataFrame({"doc_a": np.array(out_a, dtype=np.int64),
                             "doc_b": np.array(out_b, dtype=np.int64)})

    return rel.bucketed_groups(docs, ["lang", "source"], _pairs,
                               est_rows=_nrows(sf_dir, "documents"))


def q_doc_ngram_jaccard(sf_dir: str):
    """Exact word-set Jaccard pairs (J >= 1/2) inside (lang, source) blocks —
    the exact-verification sibling of the MinHash estimate family (see
    ``dedup.ngram_jaccard_pairs``; integer predicate den*inter >= num*union,
    counts over 64-bit FNV word-hash sets)."""
    docs = _rp(sf_dir, "documents", ["doc_id", "text", "lang", "source"])
    return dedup.ngram_jaccard_pairs(docs, 1, 2,
                                     est_rows=_nrows(sf_dir, "documents"))


SQL_DOC_NGRAM_JACCARD = r"""
WITH toks AS (
  SELECT doc_id, lang, source,
         list_distinct(regexp_extract_all(lower(text), '\w+')) AS tok
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       len(list_intersect(a.tok, b.tok)) AS n_inter,
       len(a.tok) + len(b.tok) - len(list_intersect(a.tok, b.tok)) AS n_union
FROM toks a JOIN toks b
  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
WHERE len(a.tok) > 0 AND len(b.tok) > 0
  AND 2 * len(list_intersect(a.tok, b.tok))
      >= len(a.tok) + len(b.tok) - len(list_intersect(a.tok, b.tok))
"""


SQL_DOC_CONTAINMENT = r"""
WITH toks AS (
  SELECT doc_id, lang, source,
         list_distinct(regexp_extract_all(lower(text), '\w+')) AS tok
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM toks a JOIN toks b
  ON a.lang = b.lang AND a.source = b.source AND a.doc_id <> b.doc_id
WHERE len(a.tok) > 0 AND list_has_all(b.tok, a.tok)
"""


def q_ann_lsh(sf_dir: str):  # exact oracle (integer bucket decisions)
    emb = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    qtab = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
                         filters=[("vec_id", "<", 8)])  # pushed-down query-side read
    qtab = pa.table({"query_id": qtab["vec_id"], "embedding": qtab["embedding"]})
    out = ann.lsh_topk(emb, ray.put(qtab), k=5)
    return out.map_batches(_sim_q4, batch_format="pyarrow")


def q_ann_ivf(sf_dir: str):  # exact oracle (integer list routing)
    emb = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    qtab = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
                         filters=[("vec_id", "<", 8)])  # pushed-down query-side read
    qtab = pa.table({"query_id": qtab["vec_id"], "embedding": qtab["embedding"]})
    out = ann.ivf_topk(emb, ray.put(qtab), k=5)
    return out.map_batches(_sim_q4, batch_format="pyarrow")


def q_doc_minhash_verified(sf_dir: str):  # exact oracle (FNV recomputed in SQL)
    """Full near-dup chain: banded LSH candidates verified in-shuffle by
    MinHash signature agreement (see ``dedup.lsh_verified_pairs``)."""
    docs = _rp(sf_dir, "documents", ["doc_id", "text"])
    sigs = dedup.minhash_signatures(docs)
    return dedup.lsh_verified_pairs(sigs, jaccard_threshold=0.5)


def q_doc_dedup_clusters(sf_dir: str):  # exact oracle (recursive-CTE reachability)
    """The corpus dedup DECISION: verified near-dup pairs -> connected
    components (``dedup.dedup_clusters``: min-label propagation + pointer
    doubling, O(log diameter) rounds) -> one canonical survivor per cluster.
    Pairs only assert a~b; deletion needs one survivor per equivalence
    CLASS, so the transitive closure is what every pair generator feeds."""
    docs = _rp(sf_dir, "documents", ["doc_id", "text"])
    sigs = dedup.minhash_signatures(docs)
    pairs = dedup.lsh_verified_pairs(sigs, jaccard_threshold=0.5)
    doc_ids = _rp(sf_dir, "documents", ["doc_id"])  # pruned second read
    return dedup.dedup_clusters(doc_ids, pairs)


def q_doc_span_dedup(sf_dir: str):  # exact oracle (FNV span hashes in SQL)
    """Repeated-span removal stats (RefinedWeb-style paragraph dedup over
    fixed 8-word windows — see ``dedup.span_dedup_stats``): per doc, how
    many spans exist and how many are non-canonical duplicates of an
    earlier (doc_id, span_idx)."""
    docs = _rp(sf_dir, "documents", ["doc_id", "text"])
    return dedup.span_dedup_stats(docs, est_rows=_nrows(sf_dir, "documents"))


SQL_DOC_SPAN_DEDUP = f"""
WITH ws AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[0-9a-z_]+') AS w
  FROM documents
),
spans AS (
  SELECT doc_id, idx,
         array_to_string(w[idx*8+1 : least(idx*8+8, len(w))], ' ') AS chunk
  FROM (SELECT doc_id, w, unnest(range(0, (len(w)+7)//8)) AS idx FROM ws)
),
hashed AS (
  SELECT doc_id, idx, {_sql_fnv('chunk')} AS h FROM spans
),
marked AS (
  SELECT doc_id,
         CASE WHEN ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, idx) > 1
              THEN 1 ELSE 0 END AS dup
  FROM hashed
),
agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
         CAST(SUM(dup) AS BIGINT) AS n_dup
  FROM marked GROUP BY doc_id
)
SELECT d.doc_id, CAST(COALESCE(a.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(COALESCE(a.n_dup, 0) AS BIGINT) AS n_dup
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


def q_orders_bloom_semi(sf_dir: str):  # exact oracle (bloom only PRUNES)
    """Bloom-prefiltered exact semi-join (``relational.bloom_semi_join``):
    orders of BUILDING-segment customers. The bitset prunes the fact stream
    map-side; survivors verify against the exact key set, so the result is
    EXACTLY the semi-join and the oracle is a plain ``IN`` — the 100 TB
    membership pattern with no sketch semantics to mirror."""
    keys = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"],
                         filters=[("c_mktsegment", "=", "BUILDING")])
    keys_ref = ray.put(keys["c_custkey"].to_numpy().astype(np.int64))
    orders = _rp(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    return rel.bloom_semi_join(orders, keys_ref, "o_custkey")


SQL_ORDERS_BLOOM_SEMI = """
SELECT o_orderkey, o_custkey FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer
                    WHERE c_mktsegment = 'BUILDING')
"""


def q_embedding_semantic_dedup(sf_dir: str):  # exact oracle (cluster+verify)
    """SemDeDup-style semantic dedup (``ann.semantic_dedup``): assign every
    vector to its nearest of the 16 codebook centroids (integer L2, same
    rule as ``embedding_kmeans``), verify exact-cosine near-dup pairs only
    WITHIN a cluster, keep = no ≥0.9 pair with a smaller id. Same planted
    perturbed copies as ``embedding_neardup`` (the corpus itself is
    near-orthogonal), so the planted duplicates must land in their
    original's cluster and be dropped."""
    emb = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])

    def _plant(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = np.flatnonzero(ids < 32)
        if len(sel) == 0:
            return batch
        x = ann._batch_matrix(batch, "embedding")
        pert = x[sel] * (1.0 + 0.01 * np.sin(ids[sel])[:, None])
        dup = pa.table({
            "vec_id": ids[sel] + 1_000_000,
            "embedding": pa.array(list(pert), type=batch["embedding"].type),
        })
        return pa.concat_tables([batch.select(["vec_id", "embedding"]), dup])

    planted = emb.map_batches(_plant, batch_format="pyarrow", batch_size=4096)
    return ann.semantic_dedup(planted, _pq_cents_ref(sf_dir), threshold=0.9)


def q_embedding_kmeans(sf_dir: str):  # exact oracle (integer Lloyd step)
    """One exact k-means (Lloyd) step over the embedding table — IVF
    codebook training (``ann.kmeans_assign_step``): codebook = the 16
    lowest-vec_id embeddings (deterministic init), assignment by integer
    L2 dist² over fixed-point components, update emitted as integer
    per-(cluster, dim) sums + a dim = −1 count row."""
    ctab = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"],
                         filters=[("vec_id", "<", 16)])
    order = np.argsort(ctab["vec_id"].to_numpy())
    cm = ann._batch_matrix(ctab, "embedding")[order]  # row i = cluster i
    cq_ref = ray.put(ann.quantize_fixed(cm))
    emb = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ann.kmeans_assign_step(emb, cq_ref)




def q_part_supplier_pagerank(sf_dir: str):  # exact oracle (integer PageRank)
    """Fixed-point PageRank (3 iterations, damping 17/20, all int64 floor
    arithmetic — ``graphrank.pagerank``) over the supplier↔part bipartite
    graph: one directed edge pair per lineitem row (parallel edges weight
    the walk). Node ids namespaced: supplier → 2s, part → 2p+1."""
    from ..stages import graphrank

    li = _rp(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])

    def _edges(t: pa.Table) -> pa.Table:
        s = 2 * t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = 2 * t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64) + 1
        return pa.table({"src": np.concatenate([s, p]),
                         "dst": np.concatenate([p, s])})

    edges = li.map_batches(_edges, batch_format="pyarrow", batch_size=65536)
    return graphrank.pagerank(edges, n_iters=3)


def _sql_pagerank_iter(prev: str, cur: str) -> str:
    return f"""
{cur} AS (
  SELECT n.node, n.deg,
         CAST(150000 + 17 * COALESCE(s.insum, 0) // 20 AS BIGINT) AS rank_q
  FROM {prev} n LEFT JOIN (
    SELECT e.dst AS node,
           SUM(CASE WHEN r.deg > 0 THEN r.rank_q // r.deg ELSE 0 END) AS insum
    FROM edges e JOIN {prev} r ON r.node = e.src
    GROUP BY e.dst
  ) s ON s.node = n.node
)"""


SQL_PART_SUPPLIER_PAGERANK = """
WITH edges AS (
  SELECT 2 * l_suppkey AS src, 2 * l_partkey + 1 AS dst FROM lineitem
  UNION ALL
  SELECT 2 * l_partkey + 1 AS src, 2 * l_suppkey AS dst FROM lineitem
),
deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM edges GROUP BY src),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
r0 AS (
  SELECT n.node, COALESCE(d.deg, 0) AS deg,
         CAST(1000000 AS BIGINT) AS rank_q
  FROM nodes n LEFT JOIN deg d ON d.node = n.node
),""" + ",".join(
    _sql_pagerank_iter(f"r{i}", f"r{i + 1}") for i in range(3)
) + """
SELECT node, rank_q FROM r3
"""


def q_events_funnel(sf_dir: str):  # exact oracle (chained strict-after MINs)
    """view → click → purchase funnel per user (``windows.funnel``): greedy
    earliest completion, strict ordering, −1 sentinels, integer µs."""
    from ..stages import windows

    ev = _rp(sf_dir, "events", ["user_id", "ts", "event_type"])

    def _us(batch: pa.Table) -> pa.Table:
        return pa.table({"user_id": batch["user_id"],
                         "us": batch["ts"].cast(pa.int64()),
                         "event_type": batch["event_type"]})

    mapped = ev.map_batches(_us, batch_format="pyarrow", batch_size=8192)
    return windows.funnel(mapped, "user_id", "us", "event_type",
                          ["view", "click", "purchase"])


SQL_EVENTS_FUNNEL = """
WITH e AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us, event_type
           FROM events),
s1 AS (SELECT user_id, MIN(us) AS t1 FROM e
       WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, MIN(e.us) AS t2
       FROM e JOIN s1 ON s1.user_id = e.user_id
       WHERE e.event_type = 'click' AND e.us > s1.t1 GROUP BY e.user_id),
s3 AS (SELECT e.user_id, MIN(e.us) AS t3
       FROM e JOIN s2 ON s2.user_id = e.user_id
       WHERE e.event_type = 'purchase' AND e.us > s2.t2 GROUP BY e.user_id),
u AS (SELECT DISTINCT user_id FROM e)
SELECT u.user_id,
       CAST(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
                 WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS steps,
       COALESCE(t1, -1) AS t1_us, COALESCE(t2, -1) AS t2_us,
       COALESCE(t3, -1) AS t3_us
FROM u LEFT JOIN s1 ON s1.user_id = u.user_id
       LEFT JOIN s2 ON s2.user_id = u.user_id
       LEFT JOIN s3 ON s3.user_id = u.user_id
"""


def q_events_rolling_sum(sf_dir: str):  # exact oracle (ROWS BETWEEN window)
    """Per-user rolling 3-row sum of the cents-quantized value, ordered by
    (ts, event_id) — the running/rolling window-aggregate class (the
    ROWS-BETWEEN sibling of the RANK/cumcount ops). Exact: int64 cents,
    cumsum-minus-shifted-cumsum inside one vectorized grouped kernel."""
    from ..stages.relational import bucketed_groups
    from ..functions.numeric import cents as _cents

    ev = _rp(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def _pre(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(),
            "us": df["ts"].astype("int64").to_numpy(),
            "event_id": df["event_id"].to_numpy(),
            "value_c": _cents(df["value"].to_numpy()),
        })

    def _roll(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["user_id", "us", "event_id"], kind="mergesort")
        uid = d["user_id"].to_numpy()
        v = d["value_c"].to_numpy().astype(np.int64)
        c = np.cumsum(v)
        n = len(d)
        # rolling sum = cumsum - cumsum shifted by 3, clipped at the group
        # start: positions within each user run
        new = np.ones(n, dtype=bool)
        new[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(new)
        run_start = np.repeat(starts, np.diff(np.append(starts, n)))
        pos = np.arange(n) - run_start
        back = np.minimum(pos, 2)  # how many preceding rows participate
        # c[i] - c[i-back-1] spans exactly rows [i-back, i]; back <= pos keeps
        # the base inside (or just before) the run, so cross-user cumsum mass
        # always cancels
        prev_idx = np.arange(n) - back - 1
        prev = np.where(prev_idx >= 0, c[np.maximum(prev_idx, 0)], 0)
        return pd.DataFrame({"event_id": d["event_id"].to_numpy(),
                             "user_id": uid, "roll3_c": c - prev})

    return bucketed_groups(ev.map_batches(_pre, batch_format="pandas",
                                          batch_size=8192),
                           ["user_id"], _roll)


SQL_EVENTS_ROLLING_SUM = """
SELECT event_id, user_id,
       CAST(SUM(value_c) OVER (PARTITION BY user_id ORDER BY us, event_id
                               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS roll3_c
FROM (SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS us,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS value_c
      FROM events)
"""


def q_event_transitions(sf_dir: str):  # exact oracle (lead() pair counts)
    """Markov transition counts over the per-user event sequence: for every
    consecutive (ts, event_id)-ordered pair, count (from_type → to_type)
    corpus-wide — sequence statistics a behavioral pipeline derives before
    training. Per-batch pre-aggregation bounds the shuffle at the type-pair
    alphabet, not the event count."""
    from ..stages.relational import partial_groupby_sum

    ev = _rp(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["user_id", "us", "event_id"], kind="mergesort")
        uid = d["user_id"].to_numpy()
        typ = d["event_type"].to_numpy()
        same = uid[1:] == uid[:-1]
        return pd.DataFrame({"from_type": typ[:-1][same],
                             "to_type": typ[1:][same]})

    def _pre(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(),
            "us": df["ts"].astype("int64").to_numpy(),
            "event_id": df["event_id"].to_numpy(),
            "event_type": df["event_type"].to_numpy(),
        })

    from ..stages.relational import bucketed_groups

    pairs = bucketed_groups(
        ev.map_batches(_pre, batch_format="pandas", batch_size=8192),
        ["user_id"], _pairs)
    return partial_groupby_sum(pairs, ["from_type", "to_type"], [],
                               count_as="n")


SQL_EVENT_TRANSITIONS = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS next_type
  FROM events
)
SELECT event_type AS from_type, next_type AS to_type,
       CAST(COUNT(*) AS BIGINT) AS n
FROM seq WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
"""


def q_trajectory_route_geometry(sf_dir: str):  # exact oracle (HMM CTE + L1)
    """The REPLACEMENT half of ``replaceFeaturesGeomsWithOsrmRoute.js:44-126``
    (T4/T5): after the HMM match (``trajectory_match_hmm``), rebuild each
    trajectory's geometry from the matched tile-centroid chain and
    re-measure it — per user, the matched-point count, the L1 length of the
    REPLACED (centroid-chain) geometry and of the original observation
    chain restricted to matched points (the length-ratio acceptance signal
    the reference gates on). Integer L1 throughout."""
    from ..stages.choose import hmm_match
    from ..stages.relational import bucketed_groups
    from ..stages.spatial import _TileState
    from ..stages.util import cached_state

    pts = _event_shapes(sf_dir)

    def _seq(batch: pa.Table) -> pa.Table:
        return pa.table({"user_id": batch["user_id"], "seq": batch["event_id"],
                         "ex": batch["ex"], "ey": batch["ey"]})

    segs = pts.map_batches(_seq, batch_format="pyarrow", batch_size=8192)
    matched = hmm_match(segs, conflation.tiles_ref(sf_dir), "user_id", "seq",
                        "ex", "ey", gap_weight=64)
    tiles_ref = conflation.tiles_ref(sf_dir)

    class _CentroidLookup(_TileState):
        def __init__(self, t: pa.Table):
            super().__init__(t)
            order = np.argsort(self.index.tile_id, kind="stable")
            self.sorted_ids = self.index.tile_id[order]
            self.scx = self.cx[order]
            self.scy = self.cy[order]

    def _geom(g: pd.DataFrame) -> pd.DataFrame:
        st: _CentroidLookup = cached_state(tiles_ref, _CentroidLookup,
                                           token="_CentroidLookup")
        d = g[g["tile_id"] >= 0].sort_values(["user_id", "seq"],
                                             kind="mergesort")
        if len(d) == 0:
            return pd.DataFrame({"user_id": np.array([], np.int64),
                                 "n_matched": np.array([], np.int64),
                                 "route_len_l1": np.array([], np.int64),
                                 "obs_len_l1": np.array([], np.int64)})
        uid = d["user_id"].to_numpy().astype(np.int64)
        seq = d["seq"].to_numpy().astype(np.int64)
        pos = np.searchsorted(st.sorted_ids,
                              d["tile_id"].to_numpy().astype(np.int64))
        cx, cy = st.scx[pos], st.scy[pos]
        px = (seq * 48271 + uid * 977) % 65536  # closed-form obs coords
        py = (seq * 69621 + 13) % 65536
        same = uid[1:] == uid[:-1]
        rl = (np.abs(np.diff(cx)) + np.abs(np.diff(cy))) * same
        ol = (np.abs(np.diff(px)) + np.abs(np.diff(py))) * same
        out = pd.DataFrame({"user_id": uid,
                            "route_d": np.append(rl, 0),
                            "obs_d": np.append(ol, 0)})
        agg = out.groupby("user_id", as_index=False, sort=True).agg(
            n_matched=("user_id", "size"), route_len_l1=("route_d", "sum"),
            obs_len_l1=("obs_d", "sum"))
        agg["n_matched"] = agg["n_matched"].astype(np.int64)
        return agg

    return bucketed_groups(matched, ["user_id"], _geom)


def q_revenue_rollup(sf_dir: str):  # exact oracle (GROUP BY ROLLUP)
    """Multi-level ROLLUP aggregation with hierarchical partial REUSE: the
    base (flag, status) aggregate is computed once from the fact table; the
    flag level and the grand total re-aggregate the BASE AGGREGATE (a
    groups-sized table), never rescanning the input — the way a 100 TB
    rollup must be built. Sentinel 'ALL' marks rolled-up dimensions."""
    from ..stages.relational import partial_groupby_sum

    li = _rp(sf_dir, "lineitem",
             ["l_returnflag", "l_linestatus", "l_extendedprice", "l_discount"])

    def _rev(batch: pa.Table) -> pa.Table:
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table({"l_returnflag": batch["l_returnflag"],
                         "l_linestatus": batch["l_linestatus"],
                         "revenue_c": cents(price * (1.0 - disc))})

    mapped = li.map_batches(_rev, batch_format="pyarrow", batch_size=8192)
    base = partial_groupby_sum(mapped, ["l_returnflag", "l_linestatus"],
                               ["revenue_c"], count_as="n_rows",
                               est_rows=_nrows(sf_dir, "lineitem"))
    base_pd = base.to_pandas()  # groups-sized: |flags| x |statuses| rows

    lvl1 = base_pd.groupby("l_returnflag", as_index=False, sort=False).agg(
        {"revenue_c": "sum", "n_rows": "sum"})
    lvl1["l_linestatus"] = "ALL"
    lvl0 = pd.DataFrame({"l_returnflag": ["ALL"], "l_linestatus": ["ALL"],
                         "revenue_c": [base_pd["revenue_c"].sum()],
                         "n_rows": [base_pd["n_rows"].sum()]})
    out = pd.concat([base_pd, lvl1, lvl0], ignore_index=True)
    out["revenue_c"] = out["revenue_c"].astype(np.int64)
    out["n_rows"] = out["n_rows"].astype(np.int64)
    cols = ["l_returnflag", "l_linestatus", "revenue_c", "n_rows"]
    return ray.data.from_pandas(out[cols])


SQL_REVENUE_ROLLUP = """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_c,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_events_time_weighted(sf_dir: str):  # exact oracle (lead() dt weights)
    """Per-user time-weighted value statistics — the telemetry rollup where
    each sample holds until the next one: weight = µs until the user's next
    event (last sample contributes nothing). Exact integer pair
    (Σ value_c·dt_us, Σ dt_us); the division to an average happens
    consumer-side, outside the compared surface. |value_c·dt_us| < 2^45 per
    row, so the int64 sums are exact."""
    from ..stages.relational import bucketed_groups

    ev = _rp(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def _pre(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(),
            # pin the unit before the int view: dt must be µs (the oracle's
            # epoch_us), not whatever datetime64 unit this pandas delivers
            "us": df["ts"].astype("datetime64[us]").astype("int64").to_numpy(),
            "event_id": df["event_id"].to_numpy(),
            "value_c": cents(df["value"].to_numpy()),
        })

    def _twa(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["user_id", "us", "event_id"], kind="mergesort")
        uid = d["user_id"].to_numpy()
        us = d["us"].to_numpy().astype(np.int64)
        v = d["value_c"].to_numpy().astype(np.int64)
        same = uid[1:] == uid[:-1]
        dt = np.append(np.diff(us) * same, 0)
        out = pd.DataFrame({"user_id": uid, "w_sum": v * dt, "dt_sum": dt})
        agg = out.groupby("user_id", as_index=False, sort=True).agg(
            w_sum=("w_sum", "sum"), dt_sum=("dt_sum", "sum"))
        return agg.astype({"w_sum": np.int64, "dt_sum": np.int64})

    pre = ev.map_batches(_pre, batch_format="pandas", batch_size=8192)
    return bucketed_groups(pre, ["user_id"], _twa)


SQL_EVENTS_TIME_WEIGHTED = """
WITH seq AS (
  SELECT user_id, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS value_c,
         lead(epoch_us(ts)) OVER w - epoch_us(ts) AS dt_us
  FROM events WINDOW w AS (PARTITION BY user_id
                           ORDER BY epoch_us(ts), event_id)
)
SELECT user_id,
       CAST(COALESCE(SUM(value_c * dt_us), 0) AS BIGINT) AS w_sum,
       CAST(COALESCE(SUM(dt_us), 0) AS BIGINT) AS dt_sum
FROM seq GROUP BY user_id
"""


def q_user_activity_islands(sf_dir: str):  # exact oracle (gaps-and-islands)
    """Gaps-and-islands over per-user activity days: distinct active days →
    maximal runs of consecutive days → per user (n_days, n_islands,
    max_island_len). The classic sessions-from-calendar analytic, one
    vectorized grouped kernel (sorted distinct days, boundary diffs)."""
    from ..stages.relational import bucketed_groups

    ev = _rp(sf_dir, "events", ["user_id", "ts"])

    def _days(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = us // 86400000000
        key = np.unique(uid * (1 << 20) + d)  # batch-local (user, day) dedup
        return pa.table({"user_id": key >> 20, "d": key & ((1 << 20) - 1)})

    days = ev.map_batches(_days, batch_format="pyarrow", batch_size=65536)

    def _islands(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["user_id", "d"]).sort_values(
            ["user_id", "d"], kind="mergesort")
        uid = d["user_id"].to_numpy()
        dd = d["d"].to_numpy().astype(np.int64)
        n = len(d)
        new_run = np.ones(n, dtype=bool)
        new_run[1:] = (uid[1:] != uid[:-1]) | (dd[1:] != dd[:-1] + 1)
        run_id = np.cumsum(new_run) - 1
        lens = np.bincount(run_id)
        run_user = uid[np.flatnonzero(new_run)]
        out = pd.DataFrame({"user_id": run_user, "len": lens})
        agg = out.groupby("user_id", as_index=False, sort=True).agg(
            n_days=("len", "sum"), n_islands=("len", "size"),
            max_island_len=("len", "max"))
        return agg.astype({"n_days": np.int64, "n_islands": np.int64,
                           "max_island_len": np.int64})

    return bucketed_groups(days, ["user_id"], _islands)


SQL_USER_ACTIVITY_ISLANDS = """
WITH days AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d
  FROM events
),
grp AS (
  SELECT user_id, d,
         d - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS g
  FROM days
),
isl AS (SELECT user_id, g, COUNT(*) AS len FROM grp GROUP BY user_id, g)
SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_days,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(MAX(len) AS BIGINT) AS max_island_len
FROM isl GROUP BY user_id
"""


def q_orders_above_customer_avg(sf_dir: str):  # exact (cross-multiplied mean)
    """Correlated-subquery decorrelation: orders strictly above their
    customer's average order value. The mean never materializes as a float —
    the predicate is cross-multiplied integer cents
    (``price_c · n_orders > sum_c``), the engine's standard
    exact-comparison form; the oracle spells the identical inequality."""
    from ..stages.relational import partial_groupby_sum

    orders = _rp(sf_dir, "orders",
                 ["o_orderkey", "o_custkey", "o_totalprice"])

    def _pc(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": batch["o_orderkey"],
            "o_custkey": batch["o_custkey"],
            "price_c": cents(batch["o_totalprice"].to_numpy(
                zero_copy_only=False)),
        })

    pc = orders.map_batches(_pc, batch_format="pyarrow", batch_size=8192)
    stats = partial_groupby_sum(pc, ["o_custkey"], ["price_c"],
                                count_as="n_orders",
                                est_rows=_nrows(sf_dir, "orders"))

    def _ident(t: pa.Table) -> pa.Table:
        return t

    stats = stats.map_batches(_ident, batch_format="pyarrow", batch_size=8192)

    def _stats_ren(t: pa.Table) -> pa.Table:
        return pa.table({"sk": t["o_custkey"], "sum_c": t["price_c"],
                         "n_orders": t["n_orders"]})

    stats = stats.map_batches(_stats_ren, batch_format="pyarrow",
                              batch_size=8192)
    j = pc.join(stats, "inner", 8, on=("o_custkey",), right_on=("sk",))

    def _above(batch: pa.Table) -> pa.Table:
        p = batch["price_c"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = batch["sum_c"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch["n_orders"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = p * n > s
        idx = pa.array(np.flatnonzero(keep), pa.int64())
        t = batch.take(idx)
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_custkey": t["o_custkey"],
                         "price_c": t["price_c"]})

    return j.map_batches(_above, batch_format="pyarrow", batch_size=8192)


SQL_ORDERS_ABOVE_CUSTOMER_AVG = """
WITH pc AS (
  SELECT o_orderkey, o_custkey,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
  FROM orders
),
st AS (SELECT o_custkey, SUM(price_c) AS sum_c,
              COUNT(*) AS n_orders
       FROM pc GROUP BY o_custkey)
SELECT p.o_orderkey, p.o_custkey, p.price_c
FROM pc p JOIN st s ON s.o_custkey = p.o_custkey
WHERE p.price_c * s.n_orders > s.sum_c
"""


def q_nation_priority_mode(sf_dir: str):  # exact oracle (deterministic mode)
    """Grouped MODE (most frequent value) with a deterministic tie rule:
    per nation, the most frequent order priority of its customers' orders
    (ties → lexicographically smallest priority). Holistic aggregate as
    count-groupby + per-group top-1 (``group_topk``)."""
    from ..stages.relational import group_topk, partial_groupby_sum

    cust = _rp(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = _rp(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    j = orders.join(cust, "inner", 8, on=("o_custkey",),
                    right_on=("c_custkey",))

    def _nk(t: pa.Table) -> pa.Table:
        return pa.table({
            "nationkey": t["c_nationkey"].cast(pa.int64()),
            "o_orderpriority": t["o_orderpriority"],
        })

    pairs = j.map_batches(_nk, batch_format="pyarrow", batch_size=8192)
    counts = partial_groupby_sum(pairs, ["nationkey", "o_orderpriority"], [],
                                 count_as="n")
    return group_topk(counts, ["nationkey"],
                      [("n", False), ("o_orderpriority", True)], k=1)


SQL_NATION_PRIORITY_MODE = """
WITH counts AS (
  SELECT CAST(c.c_nationkey AS BIGINT) AS nationkey, o.o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY c.c_nationkey, o.o_orderpriority
)
SELECT nationkey, o_orderpriority, n FROM (
  SELECT nationkey, o_orderpriority, n,
         ROW_NUMBER() OVER (PARTITION BY nationkey
                            ORDER BY n DESC, o_orderpriority) AS rn
  FROM counts
) WHERE rn = 1
"""


def q_snapshot_upsert(sf_dir: str):  # exact oracle (latest-wins MERGE)
    """CDC upsert / MERGE INTO semantics: a base snapshot (customer balances,
    version ts = −1) merged with an update stream (events, latest
    (ts, event_id) wins per key). One grouped kernel decides winner +
    update count per key — the last-write-wins compaction every
    log-structured ingest runs."""
    from ..stages.relational import bucketed_groups

    ev = _rp(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    base = _rp(sf_dir, "customer", ["c_custkey", "c_acctbal"])

    def _ev(batch: pa.Table) -> pa.Table:
        return pa.table({
            "key": batch["user_id"].cast(pa.int64()),
            "value_c": cents(batch["value"].to_numpy(zero_copy_only=False)),
            "us": batch["ts"].cast(pa.int64()),
            "event_id": batch["event_id"].cast(pa.int64()),
        })

    def _base(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "key": batch["c_custkey"].cast(pa.int64()),
            "value_c": cents(batch["c_acctbal"].to_numpy(zero_copy_only=False)),
            "us": np.full(n, -1, dtype=np.int64),
            "event_id": np.full(n, -1, dtype=np.int64),
        })

    u = ev.map_batches(_ev, batch_format="pyarrow", batch_size=8192).union(
        base.map_batches(_base, batch_format="pyarrow", batch_size=8192))

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["key", "us", "event_id"], kind="mergesort")
        key = d["key"].to_numpy()
        last = np.ones(len(d), dtype=bool)
        last[:-1] = key[:-1] != key[1:]  # last row per key = latest version
        win = d[last]
        upd = (d.assign(_ev=(d["us"].to_numpy() >= 0).astype(np.int64))
               .groupby("key", sort=True)["_ev"].sum())
        out = pd.DataFrame({
            "key": win["key"].to_numpy(),
            "final_value_c": win["value_c"].to_numpy().astype(np.int64),
            "from_event": win["us"].to_numpy() >= 0,
        }).sort_values("key")
        out["n_updates"] = upd.to_numpy().astype(np.int64)
        return out[["key", "final_value_c", "n_updates", "from_event"]]

    return bucketed_groups(u, ["key"], _merge)


SQL_SNAPSHOT_UPSERT = """
WITH u AS (
  SELECT user_id AS key, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS value_c,
         CAST(epoch_us(ts) AS BIGINT) AS us, event_id
  FROM events
  UNION ALL
  SELECT c_custkey, CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT),
         CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
  FROM customer
),
win AS (
  SELECT key, value_c, us,
         ROW_NUMBER() OVER (PARTITION BY key
                            ORDER BY us DESC, event_id DESC) AS rn
  FROM u
),
upd AS (SELECT key, CAST(SUM(CASE WHEN us >= 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_updates
        FROM u GROUP BY key)
SELECT w.key, w.value_c AS final_value_c, p.n_updates, w.us >= 0 AS from_event
FROM win w JOIN upd p USING (key) WHERE w.rn = 1
"""


def q_user_interval_coverage(sf_dir: str):  # exact oracle (interval union)
    """Interval-union coverage: each event opens a 5-minute window; per
    user, the total µs covered by the UNION of its windows and the count
    of merged segments — the sweep-line interval-merge every
    availability/uptime rollup needs. Vectorized per-run cummax."""
    from ..stages.relational import bucketed_groups

    W = 300_000_000  # 5 min in µs
    ev = _rp(sf_dir, "events", ["user_id", "ts"])

    def _iv(batch: pa.Table) -> pa.Table:
        return pa.table({"user_id": batch["user_id"].cast(pa.int64()),
                         "s": batch["ts"].cast(pa.int64())})

    iv = ev.map_batches(_iv, batch_format="pyarrow", batch_size=8192)

    def _cover(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["user_id", "s"], kind="mergesort")
        uid = d["user_id"].to_numpy()
        s = d["s"].to_numpy().astype(np.int64)
        e = s + W
        n = len(d)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(new_user)
        users, covered, nseg = [], [], []
        for a, b in zip(starts, np.append(starts[1:], n)):
            cm = np.maximum.accumulate(e[a:b])
            # a new merged segment opens where s exceeds the running max end
            new_seg = np.ones(b - a, dtype=bool)
            new_seg[1:] = s[a + 1:b] > cm[:-1]
            seg_id = np.cumsum(new_seg) - 1
            seg_start = s[a:b][new_seg]
            seg_end = np.maximum.reduceat(cm, np.flatnonzero(new_seg))
            users.append(uid[a])
            covered.append(int((seg_end - seg_start).sum()))
            nseg.append(int(new_seg.sum()))
        return pd.DataFrame({"user_id": np.array(users, np.int64),
                             "covered_us": np.array(covered, np.int64),
                             "n_segments": np.array(nseg, np.int64)})

    return bucketed_groups(iv, ["user_id"], _cover)


SQL_USER_INTERVAL_COVERAGE = """
WITH iv AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS s,
         CAST(epoch_us(ts) AS BIGINT) + 300000000 AS e
  FROM events
),
o AS (
  SELECT user_id, s, e,
         MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS pmax
  FROM iv
),
g AS (
  SELECT user_id, s, e,
         SUM(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY s, e
                 ROWS UNBOUNDED PRECEDING) AS grp
  FROM o
),
seg AS (SELECT user_id, grp, MAX(e) - MIN(s) AS len
        FROM g GROUP BY user_id, grp)
SELECT user_id, CAST(SUM(len) AS BIGINT) AS covered_us,
       CAST(COUNT(*) AS BIGINT) AS n_segments
FROM seg GROUP BY user_id
"""


def q_purchase_attribution(sf_dir: str):  # exact oracle (windowed as-of)
    """Last-touch attribution: every purchase attributes to the user's
    latest preceding click within 30 minutes (ties → largest click id, the
    as-of rule), else −1 — the marketing-attribution shape, expressed as a
    per-user backward scan. Exact integer µs lag."""
    from ..stages.relational import bucketed_groups

    ev = _rp(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    WIN = 1_800_000_000  # 30 min in µs

    def _pre(batch: pa.Table) -> pa.Table:
        t = batch["event_type"].to_numpy(zero_copy_only=False)
        keep = (t == "purchase") | (t == "click")
        idx = pa.array(np.flatnonzero(keep), pa.int64())
        b = batch.take(idx)
        return pa.table({
            "user_id": b["user_id"].cast(pa.int64()),
            "us": b["ts"].cast(pa.int64()),
            "event_id": b["event_id"].cast(pa.int64()),
            "is_purchase": pa.array(
                b["event_type"].to_numpy(zero_copy_only=False) == "purchase"),
        })

    pre = ev.map_batches(_pre, batch_format="pyarrow", batch_size=8192)

    def _attr(g: pd.DataFrame) -> pd.DataFrame:
        # order: (user, us, event_id); clicks sort BEFORE a same-µs purchase
        # only if their event_id is smaller — the oracle's ts <= rule needs
        # same-ts clicks eligible, so scan clicks by (us, event_id) and
        # binary-search with side='right' on (us, +inf) per purchase
        d = g.sort_values(["user_id", "us", "event_id"], kind="mergesort")
        uid = d["user_id"].to_numpy()
        us = d["us"].to_numpy().astype(np.int64)
        eid = d["event_id"].to_numpy().astype(np.int64)
        isp = d["is_purchase"].to_numpy()
        out_rows = []
        bounds = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        for a, b in zip(bounds, np.append(bounds[1:], len(d))):
            cus, ceid = us[a:b][~isp[a:b]], eid[a:b][~isp[a:b]]
            # clicks sorted by (us, event_id); latest eligible = rightmost
            # with us <= purchase us (ties between clicks -> largest id)
            for pu, pe in zip(us[a:b][isp[a:b]], eid[a:b][isp[a:b]]):
                j = np.searchsorted(cus, pu, side="right") - 1
                if j >= 0 and pu - cus[j] <= WIN:
                    # among clicks sharing cus[j], the sort already puts the
                    # largest event_id last within equal us
                    out_rows.append((uid[a], pe, ceid[j], pu - cus[j]))
                else:
                    out_rows.append((uid[a], pe, -1, -1))
        if not out_rows:
            return pd.DataFrame({"user_id": np.array([], np.int64),
                                 "purchase_id": np.array([], np.int64),
                                 "click_id": np.array([], np.int64),
                                 "lag_us": np.array([], np.int64)})
        arr = np.array(out_rows, dtype=np.int64)
        return pd.DataFrame({"user_id": arr[:, 0], "purchase_id": arr[:, 1],
                             "click_id": arr[:, 2], "lag_us": arr[:, 3]})

    return bucketed_groups(pre, ["user_id"], _attr)


SQL_PURCHASE_ATTRIBUTION = """
WITH p AS (SELECT user_id, event_id AS purchase_id,
                  CAST(epoch_us(ts) AS BIGINT) AS pus
           FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id, event_id AS click_id,
             CAST(epoch_us(ts) AS BIGINT) AS cus
      FROM events WHERE event_type = 'click'),
j AS (
  SELECT p.user_id, p.purchase_id, c.click_id, p.pus - c.cus AS lag_us,
         ROW_NUMBER() OVER (PARTITION BY p.user_id, p.purchase_id
                            ORDER BY c.cus DESC, c.click_id DESC) AS rn
  FROM p JOIN c ON c.user_id = p.user_id
    AND c.cus <= p.pus AND p.pus - c.cus <= 1800000000
)
SELECT user_id, purchase_id,
       COALESCE(j2.click_id, -1) AS click_id,
       COALESCE(j2.lag_us, -1) AS lag_us
FROM p LEFT JOIN (SELECT * FROM j WHERE rn = 1) j2 USING (user_id, purchase_id)
"""


def q_value_variance_by_type(sf_dir: str):  # exact (integer second moments)
    """Grouped variance WITHOUT floats: per event type, the exact integer
    moments (n, Σ value_c, Σ value_c²) — variance is the rational
    (n·Σx² − (Σx)²) / n², emitted as numerator + n so nothing float ever
    crosses the compared surface. Second-moment combiner rides the same
    partial-aggregation path as the sums."""
    from ..stages.relational import partial_groupby_sum

    ev = _rp(sf_dir, "events", ["event_type", "value"])

    def _m(batch: pa.Table) -> pa.Table:
        v = cents(batch["value"].to_numpy(zero_copy_only=False))
        return pa.table({"event_type": batch["event_type"],
                         "sum_c": v, "sumsq_c": v * v})

    m = ev.map_batches(_m, batch_format="pyarrow", batch_size=8192)
    agg = partial_groupby_sum(m, ["event_type"], ["sum_c", "sumsq_c"],
                              count_as="n")

    def _var(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy().astype(np.int64)
        s = df["sum_c"].to_numpy().astype(np.int64)
        s2 = df["sumsq_c"].to_numpy().astype(np.int64)
        return pd.DataFrame({"event_type": df["event_type"],
                             "n": n, "sum_c": s,
                             "var_num": n * s2 - s * s})

    return agg.map_batches(_var, batch_format="pandas", batch_size=8192)


SQL_VALUE_VARIANCE_BY_TYPE = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(value_c) AS BIGINT) AS sum_c,
       CAST(COUNT(*) * SUM(value_c * value_c) - SUM(value_c) * SUM(value_c)
            AS BIGINT) AS var_num
FROM (SELECT event_type,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS value_c
      FROM events)
GROUP BY event_type
"""


# Connected components as exact SQL: reachability of every node id through
# the symmetric verified-pair edge set (recursive CTE, UNION dedups states so
# it terminates), then MIN over reachable labels = the component minimum —
# the same fixpoint dedup_clusters' min-label propagation converges to.
SQL_DOC_DEDUP_CLUSTERS = _SQL_MINHASH_CTES.replace(
    "WITH ws", "WITH RECURSIVE ws", 1) + """
, cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM capped a JOIN capped b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
ver AS (
  SELECT c.doc_a, c.doc_b
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.doc_a
  JOIN sig sb ON sb.doc_id = c.doc_b AND sb.j = sa.j
  GROUP BY c.doc_a, c.doc_b
  HAVING SUM(CASE WHEN sa.sv = sb.sv THEN 1 ELSE 0 END) >= 32
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM ver
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM ver
),
reach AS (
  SELECT src AS node, src AS lbl FROM edges
  UNION
  SELECT e.dst AS node, r.lbl FROM reach r JOIN edges e ON e.src = r.node
),
lab AS (SELECT node, MIN(lbl) AS lbl FROM reach GROUP BY node),
assigned AS (
  SELECT d.doc_id, COALESCE(l.lbl, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN lab l ON l.node = d.doc_id
)
SELECT doc_id, cluster_id,
       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       doc_id = cluster_id AS keep
FROM assigned
"""


def q_events_approx_users(sf_dir: str):  # exact oracle (integer HLL registers)
    """Approximate distinct users per day-of-week via the HyperLogLog
    register sketch (``relational.approx_distinct``) — shuffle bounded at
    groups x 1024 register rows per batch, the 100 TB cardinality path
    (the exact sibling is ``events_distinct_users``)."""
    ev = _rp(sf_dir, "events", ["ts", "user_id"])

    def _dow(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"dow": (us // 86400000000) % 7,
                         "user_id": batch["user_id"]})

    mapped = ev.map_batches(_dow, batch_format="pyarrow", batch_size=8192)
    return rel.approx_distinct(mapped, ["dow"], "user_id", p=10)


_SQL_M64 = "18446744073709551616"
# splitmix64 of user_id (same mulmod decomposition as the minhash perms CTE),
# then HLL registers: reg = low 10 bits, rank = 54-bit leading-zero rank,
# est_x1000 = floor(m^2*1000*2^64 / S) in exact HUGEINT arithmetic.
SQL_EVENTS_APPROX_USERS = f"""
WITH h AS (
  SELECT dow, xor(z2, z2 >> 31) AS hh
  FROM (
    SELECT dow,
           ((xor(z1, z1 >> 27) * 321982955) % {_SQL_M64}
            + ((xor(z1, z1 >> 27) * 2496678331) % 4294967296) * 4294967296)
             % {_SQL_M64} AS z2
    FROM (
      SELECT dow,
             ((xor(z0, z0 >> 30) * 484763065) % {_SQL_M64}
              + ((xor(z0, z0 >> 30) * 3210233709) % 4294967296) * 4294967296)
               % {_SQL_M64} AS z1
      FROM (
        SELECT (CAST(epoch_us(ts) AS BIGINT) // 86400000000) % 7 AS dow,
               (CAST(user_id AS HUGEINT) + CAST(11400714819323198485 AS HUGEINT))
                 % {_SQL_M64} AS z0
        FROM events
      )
    )
  )
),
regs AS (
  SELECT dow, CAST(hh % 1024 AS BIGINT) AS reg,
         MAX(CASE WHEN hh // 1024 = 0 THEN 55
                  ELSE 55 - length(format('{{:b}}', CAST(hh // 1024 AS BIGINT)))
             END) AS mrank
  FROM h GROUP BY dow, reg
),
agg AS (
  SELECT dow, COUNT(*) AS n_regs,
         SUM(CAST(1 AS HUGEINT) << (64 - mrank)) AS s_present
  FROM regs GROUP BY dow
)
SELECT CAST(dow AS BIGINT) AS dow, CAST(n_regs AS BIGINT) AS n_regs,
       CAST((CAST(1048576000 AS HUGEINT) << 64)
            // ((CAST(1024 - n_regs AS HUGEINT) << 64) + s_present) AS BIGINT)
         AS est_x1000
FROM agg
"""


def q_doc_phash_neardup(sf_dir: str):  # exact oracle (pigeonhole-complete bands)
    """Perceptual-hash Hamming near-dup pairs (``dedup.phash_neardup_pairs``)
    over a content-derived 64-bit hash. FNV is avalanche (textual near-dups
    don't yield nearby hashes), so the corpus is augmented map-side with
    DETERMINISTIC <=2-bit-flipped copies of doc_id < 32 (id + 1,000,000) —
    the same planted-pair recipe as ``embedding_neardup``. With 4 x 16-bit
    bands and max_hamming=3, banding recall is pigeonhole-EXACT."""
    docs = _rp(sf_dir, "documents", ["doc_id", "text"])

    def _ph(batch: pa.Table) -> pa.Table:
        from ..functions import text as tx

        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ph = tx.fnv1a64_batch(batch["text"].to_pylist())
        sel = ids < 32
        b1 = (ids[sel] % 64).astype(np.uint64)
        b2 = ((ids[sel] * 31 + 7) % 64).astype(np.uint64)
        mask = (np.uint64(1) << b1) | (np.uint64(1) << b2)
        return pa.table({
            "doc_id": np.concatenate([ids, ids[sel] + 1_000_000]),
            "phash": np.concatenate([ph, ph[sel] ^ mask]).view(np.int64),
        })

    return dedup.phash_neardup_pairs(
        docs.map_batches(_ph, batch_format="pyarrow"))


# Engine mirror: FNV-derived 64-bit hash; HUGEINT domain for logical shifts
# (banding), BIGINT two's complement for xor/bit_count (DuckDB's bit_count on
# BIGINT counts the raw 64-bit pattern, matching uint64 popcount).
_SQL_H1 = "(CAST(1 AS HUGEINT) << 63)"
_SQL_H64 = "(CAST(1 AS HUGEINT) << 64)"
SQL_DOC_PHASH_NEARDUP = f"""
WITH raw AS (
  SELECT doc_id, {_sql_fnv('text')} AS ph FROM documents
),
base AS (
  SELECT doc_id,
         CAST(CASE WHEN ph >= {_SQL_H1} THEN ph - {_SQL_H64} ELSE ph END AS BIGINT) AS pb
  FROM raw
),
aug AS (
  SELECT doc_id + 1000000 AS doc_id, xor(pb, m.mask) AS pb
  FROM base,
  LATERAL (SELECT CAST(doc_id % 64 AS INTEGER) AS b1,
                  CAST((doc_id * 31 + 7) % 64 AS INTEGER) AS b2) t,
  LATERAL (SELECT CAST(CASE WHEN mh >= {_SQL_H1} THEN mh - {_SQL_H64} ELSE mh END AS BIGINT) AS mask
           FROM (SELECT (CAST(1 AS HUGEINT) << t.b1) | (CAST(1 AS HUGEINT) << t.b2) AS mh)) m
  WHERE doc_id < 32
),
p AS (SELECT * FROM base UNION ALL SELECT * FROM aug),
hu AS (
  SELECT doc_id, pb,
         CASE WHEN pb < 0 THEN CAST(pb AS HUGEINT) + {_SQL_H64}
              ELSE CAST(pb AS HUGEINT) END AS h
  FROM p
),
b AS (
  SELECT doc_id, pb, v.band_id,
         CAST((h // (CAST(1 AS HUGEINT) << (v.band_id * 16))) % 65536 AS BIGINT) AS band_key
  FROM hu, (VALUES (0), (1), (2), (3)) v(band_id)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b, a.pb AS pa_, c.pb AS pb_
  FROM b a
  JOIN b c ON a.band_id = c.band_id AND a.band_key = c.band_key
          AND a.doc_id < c.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(pa_, pb_)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(pa_, pb_)) <= 3
"""


def q_embedding_neardup(sf_dir: str):  # exact oracle (integer bucket + verify)
    """Embedding-cosine near-duplicate pairs (exact-verified LSH buckets;
    see ``ann.cosine_neardup_pairs``). The synthetic embeddings are
    near-orthogonal (max pairwise cosine ~0.51), so the corpus is augmented
    map-side with DETERMINISTIC perturbed copies of vec_id < 32 (id +
    1,000,000; +1% relative jitter) — the operator must recover exactly
    those planted pairs at threshold 0.9."""
    emb = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])

    def _plant(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = np.flatnonzero(ids < 32)
        if len(sel) == 0:
            return batch
        from ..stages.ann import _batch_matrix

        x = _batch_matrix(batch, "embedding")
        pert = x[sel] * (1.0 + 0.01 * np.sin(ids[sel])[:, None])
        dup = pa.table({
            "vec_id": ids[sel] + 1_000_000,
            "embedding": pa.array(list(pert), type=batch["embedding"].type),
        })
        return pa.concat_tables([batch.select(["vec_id", "embedding"]), dup])

    planted = emb.map_batches(_plant, batch_format="pyarrow", batch_size=4096)
    return ann.cosine_neardup_pairs(planted, threshold=0.9)


# quantized embeddings + closed-form planes shared by the ANN-family oracles:
# bucket decisions are pure integer math, identical to ``stages.ann``
# (quantize_fixed / int_planes / sign_planes); final sims use
# list_cosine_similarity like SQL_ANN_TOPK.
_SQL_EMB_FIXED = """
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed,
         [CAST(FLOOR(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
          FOR x IN embedding] AS qv
  FROM {src}
"""


def _sql_int_planes(n_planes: int) -> str:
    return f"""
  SELECT CAST(j AS BIGINT) AS j,
         [(d * 73856093 + j * 19349663 + 7) % 1000003 * 2654435761 % 2001 - 1000
          FOR d IN range(0, (SELECT len(qv) FROM e LIMIT 1))] AS pl
  FROM range({n_planes}) t(j)
"""


_SQL_IDOT = "list_sum([a.qv[_di] * p.pl[_di] FOR _di IN range(1, len(a.qv) + 1)])"


SQL_ANN_LSH = f"""
WITH e AS ({_SQL_EMB_FIXED.format(src='embeddings')}),
planes AS ({_sql_int_planes(10)}),
sig AS (
  SELECT vec_id,
         SUM(CASE WHEN dot > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT))
                  ELSE 0 END) AS s
  FROM (SELECT a.vec_id, p.j, {_SQL_IDOT} AS dot
        FROM e a CROSS JOIN planes p)
  GROUP BY vec_id
),
qs AS (SELECT vec_id AS query_id, s FROM sig WHERE vec_id < 8),
probes AS (  -- own bucket + all Hamming-distance-1 buckets (multiprobe r=1)
  SELECT q.query_id,
         CASE WHEN b.b < 0 THEN q.s
              ELSE xor(q.s, CAST(1 AS BIGINT) << CAST(b.b AS INT)) END AS ps
  FROM qs q, (SELECT unnest(range(-1, 10)) AS b) b
),
cand AS (
  SELECT p.query_id, x.vec_id
  FROM probes p JOIN sig x ON x.s = p.ps
  WHERE x.vec_id <> p.query_id
),
sims AS (
  SELECT c.query_id, c.vec_id, list_cosine_similarity(eq.ed, ex.ed) AS sim
  FROM cand c JOIN e eq ON eq.vec_id = c.query_id
              JOIN e ex ON ex.vec_id = c.vec_id
)
SELECT query_id, vec_id, sim_rank, CAST(FLOOR(sim * 10000 + 0.5) AS BIGINT) AS sim_q4
FROM (SELECT query_id, vec_id, sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, vec_id) AS sim_rank
      FROM sims)
WHERE sim_rank <= 5
"""


SQL_EMBEDDING_KMEANS = f"""
WITH e AS ({_SQL_EMB_FIXED.format(src='embeddings')}),
q AS (
  SELECT vec_id, i - 1 AS dim, qv[i] AS xq
  FROM e, (SELECT unnest(range(1, (SELECT len(qv) FROM e LIMIT 1) + 1)) AS i)
),
cent AS (SELECT vec_id AS cid, dim, xq FROM q WHERE vec_id < 16),
dist AS (
  SELECT v.vec_id, c.cid,
         SUM((v.xq - c.xq) * (v.xq - c.xq)) AS d2
  FROM q v JOIN cent c USING (dim)
  GROUP BY v.vec_id, c.cid
),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM dist
  ) WHERE rn = 1
),
sums AS (
  SELECT a.cid AS cluster_id, v.dim, CAST(SUM(v.xq) AS BIGINT) AS sum_q
  FROM assign a JOIN q v USING (vec_id)
  GROUP BY a.cid, v.dim
),
cnts AS (
  SELECT cid AS cluster_id, CAST(-1 AS BIGINT) AS dim,
         CAST(COUNT(*) AS BIGINT) AS sum_q
  FROM assign GROUP BY cid
)
SELECT cluster_id, CAST(dim AS BIGINT) AS dim, sum_q FROM sums
UNION ALL SELECT * FROM cnts
"""


SQL_EMBEDDING_SEMANTIC_DEDUP = f"""
WITH allv AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id,
         [CAST(CAST(x AS DOUBLE) * (1 + 0.01 * sin(CAST(vec_id AS DOUBLE))) AS REAL)
          FOR x IN embedding] AS embedding
  FROM embeddings WHERE vec_id < 32
),
e AS ({_SQL_EMB_FIXED.format(src='allv')}),
q AS (
  SELECT vec_id, i - 1 AS dim, qv[i] AS xq
  FROM e, (SELECT unnest(range(1, (SELECT len(qv) FROM e LIMIT 1) + 1)) AS i)
),
cent AS (SELECT vec_id AS cid, dim, xq FROM q WHERE vec_id < 16),
dist AS (
  SELECT v.vec_id, c.cid, SUM((v.xq - c.xq) * (v.xq - c.xq)) AS d2
  FROM q v JOIN cent c USING (dim) GROUP BY v.vec_id, c.cid
),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM dist
  ) WHERE rn = 1
),
dups AS (
  SELECT DISTINCT b.vec_id AS vb
  FROM assign a JOIN assign b ON a.cid = b.cid AND a.vec_id < b.vec_id
  JOIN e ea ON ea.vec_id = a.vec_id
  JOIN e eb ON eb.vec_id = b.vec_id
  WHERE list_cosine_similarity(ea.ed, eb.ed) >= 0.9
)
SELECT s.vec_id, CAST(s.cid AS BIGINT) AS cluster_id,
       s.vec_id NOT IN (SELECT vb FROM dups) AS keep
FROM assign s
"""


def _pq_cents_ref(sf_dir: str):
    ctab = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"],
                         filters=[("vec_id", "<", 16)])
    order = np.argsort(ctab["vec_id"].to_numpy())
    cm = ann._batch_matrix(ctab, "embedding")[order]  # row i = code i
    return ray.put(ann.quantize_fixed(cm))


def q_embedding_pq_codes(sf_dir: str):  # exact oracle (integer PQ encode)
    """Product-Quantization encoding (``ann.pq_encode``): 8 subspaces × 16
    codes, each vector → ONE packed int64 (4 bits/subspace) — the
    16-byte-per-vector layout of billion-scale vector indexes. Codebooks =
    the 16 lowest-vec_id embeddings (the ``embedding_kmeans`` init), so
    PQ completes the IVF(+train)+PQ story."""
    emb = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ann.pq_encode(emb, _pq_cents_ref(sf_dir))


def q_ann_pq_adc(sf_dir: str):  # exact oracle (integer ADC ranking)
    """Asymmetric-distance top-5 over PQ codes (``ann.pq_adc_topk``):
    per-query (m, K) integer lookup tables, scoring = m lookups + sum."""
    emb = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    qtab = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"],
                         filters=[("vec_id", "<", 4)])
    return ann.pq_adc_topk(emb, _pq_cents_ref(sf_dir), ray.put(qtab), k=5)


_SQL_PQ_CTES = f"""
WITH e AS ({_SQL_EMB_FIXED.format(src='embeddings')}),
q AS (
  SELECT vec_id, i - 1 AS dim, qv[i] AS xq
  FROM e, (SELECT unnest(range(1, (SELECT len(qv) FROM e LIMIT 1) + 1)) AS i)
),
cent AS (SELECT vec_id AS cid, dim, xq FROM q WHERE vec_id < 16),
sd AS (  -- per-(vector, code, subspace) integer L2 distance²
  SELECT v.vec_id, c.cid, v.dim // 8 AS m,
         SUM((v.xq - c.xq) * (v.xq - c.xq)) AS d2
  FROM q v JOIN cent c ON c.dim = v.dim
  GROUP BY v.vec_id, c.cid, v.dim // 8
),
code AS (
  SELECT vec_id, m, cid AS code FROM (
    SELECT vec_id, m, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d2, cid) AS rn
    FROM sd
  ) WHERE rn = 1
)
"""

SQL_EMBEDDING_PQ_CODES = _SQL_PQ_CTES + """
SELECT vec_id,
       CAST(SUM(code * (CAST(1 AS BIGINT) << CAST(4 * m AS INT))) AS BIGINT)
         AS pq_code
FROM code GROUP BY vec_id
"""

SQL_ANN_PQ_ADC = _SQL_PQ_CTES + """
, lut AS (SELECT vec_id AS query_id, cid, m, d2 FROM sd WHERE vec_id < 4),
adc AS (
  SELECT l.query_id, co.vec_id, CAST(SUM(l.d2) AS BIGINT) AS adc
  FROM code co JOIN lut l ON l.m = co.m AND l.cid = co.code
  WHERE co.vec_id <> l.query_id
  GROUP BY l.query_id, co.vec_id
)
SELECT query_id, vec_id, adc, adc_rank FROM (
  SELECT query_id, vec_id, adc,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY adc, vec_id) AS adc_rank
  FROM adc
) WHERE adc_rank <= 5
"""


def q_ann_ivfpq(sf_dir: str):  # exact oracle (integer routing + ADC ranking)
    """IVF-PQ composed search (``ann.ivfpq_topk``): sign-plane coarse
    routing to nprobe=8 inverted lists, ADC scoring over PQ codes of ONLY
    the routed candidates — the full billion-scale index, every decision
    integer."""
    emb = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    qtab = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"],
                         filters=[("vec_id", "<", 8)])
    return ann.ivfpq_topk(emb, _pq_cents_ref(sf_dir), ray.put(qtab), k=5)


SQL_ANN_IVFPQ = f"""
WITH e AS ({_SQL_EMB_FIXED.format(src='embeddings')}),
q AS (
  SELECT vec_id, i - 1 AS dim, qv[i] AS xq
  FROM e, (SELECT unnest(range(1, (SELECT len(qv) FROM e LIMIT 1) + 1)) AS i)
),
centpq AS (SELECT vec_id AS cid, dim, xq FROM q WHERE vec_id < 16),
sd AS (
  SELECT v.vec_id, c.cid, v.dim // 8 AS m,
         SUM((v.xq - c.xq) * (v.xq - c.xq)) AS d2
  FROM q v JOIN centpq c ON c.dim = v.dim
  GROUP BY v.vec_id, c.cid, v.dim // 8
),
code AS (
  SELECT vec_id, m, cid AS code FROM (
    SELECT vec_id, m, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d2, cid) AS rn
    FROM sd
  ) WHERE rn = 1
),
cents AS (  -- ±1 coarse rows (equal norms): argmax integer dot = nearest
  SELECT CAST(j AS BIGINT) AS j,
         [CASE WHEN (j * 83492791 + d * 52916611 + 3) % 1000003
                    * 2654435761 % 4294967296 // 32768 % 2 = 1
               THEN 1 ELSE -1 END
          FOR d IN range(0, (SELECT len(qv) FROM e LIMIT 1))] AS pl
  FROM range(64) t(j)
),
xd AS (SELECT a.vec_id, p.j, {_SQL_IDOT} AS dot
       FROM e a CROSS JOIN cents p),
rk AS (SELECT vec_id, j,
              ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dot DESC, j) AS rn
       FROM xd),
assign AS (SELECT vec_id, j FROM rk WHERE rn = 1),
qprobe AS (SELECT vec_id AS query_id, j FROM rk WHERE vec_id < 8 AND rn <= 8),
cand AS (
  SELECT qp.query_id, a.vec_id
  FROM qprobe qp JOIN assign a ON a.j = qp.j
  WHERE a.vec_id <> qp.query_id
),
lut AS (SELECT vec_id AS query_id, cid, m, d2 FROM sd WHERE vec_id < 8),
adc AS (
  SELECT c.query_id, c.vec_id, CAST(SUM(l.d2) AS BIGINT) AS adc
  FROM cand c
  JOIN code co ON co.vec_id = c.vec_id
  JOIN lut l ON l.query_id = c.query_id AND l.m = co.m AND l.cid = co.code
  GROUP BY c.query_id, c.vec_id
)
SELECT query_id, vec_id, adc, adc_rank FROM (
  SELECT query_id, vec_id, adc,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY adc, vec_id) AS adc_rank
  FROM adc
) WHERE adc_rank <= 5
"""


SQL_ANN_IVF = f"""
WITH e AS ({_SQL_EMB_FIXED.format(src='embeddings')}),
cents AS (  -- ±1 codebook rows (equal norms): argmax integer dot = nearest
  SELECT CAST(j AS BIGINT) AS j,
         [CASE WHEN (j * 83492791 + d * 52916611 + 3) % 1000003
                    * 2654435761 % 4294967296 // 32768 % 2 = 1
               THEN 1 ELSE -1 END
          FOR d IN range(0, (SELECT len(qv) FROM e LIMIT 1))] AS pl
  FROM range(64) t(j)
),
xd AS (SELECT a.vec_id, p.j, {_SQL_IDOT} AS dot
       FROM e a CROSS JOIN cents p),
rk AS (SELECT vec_id, j,
              ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dot DESC, j) AS rn
       FROM xd),
assign AS (SELECT vec_id, j FROM rk WHERE rn = 1),
qprobe AS (SELECT vec_id AS query_id, j FROM rk WHERE vec_id < 8 AND rn <= 8),
cand AS (
  SELECT qp.query_id, a.vec_id
  FROM qprobe qp JOIN assign a ON a.j = qp.j
  WHERE a.vec_id <> qp.query_id
),
sims AS (
  SELECT c.query_id, c.vec_id, list_cosine_similarity(eq.ed, ex.ed) AS sim
  FROM cand c JOIN e eq ON eq.vec_id = c.query_id
              JOIN e ex ON ex.vec_id = c.vec_id
)
SELECT query_id, vec_id, sim_rank, CAST(FLOOR(sim * 10000 + 0.5) AS BIGINT) AS sim_q4
FROM (SELECT query_id, vec_id, sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, vec_id) AS sim_rank
      FROM sims)
WHERE sim_rank <= 5
"""


SQL_EMBEDDING_NEARDUP = f"""
WITH allv AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id,
         [CAST(CAST(x AS DOUBLE) * (1 + 0.01 * sin(CAST(vec_id AS DOUBLE))) AS REAL)
          FOR x IN embedding] AS embedding
  FROM embeddings WHERE vec_id < 32
),
e AS ({_SQL_EMB_FIXED.format(src='allv')}),
planes AS ({_sql_int_planes(12)}),
sig AS (
  SELECT vec_id,
         SUM(CASE WHEN dot > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT))
                  ELSE 0 END) AS bucket
  FROM (SELECT a.vec_id, p.j, {_SQL_IDOT} AS dot
        FROM e a CROSS JOIN planes p)
  GROUP BY vec_id
),
capped AS (
  SELECT * FROM (
    SELECT vec_id, bucket,
           ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id) AS rn
    FROM sig
  ) WHERE rn <= 512
),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         list_cosine_similarity(ea.ed, eb.ed) AS sim
  FROM capped a JOIN capped b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  JOIN e ea ON ea.vec_id = a.vec_id
  JOIN e eb ON eb.vec_id = b.vec_id
)
SELECT vec_a, vec_b, CAST(FLOOR(sim * 10000 + 0.5) AS BIGINT) AS sim_q4
FROM pairs WHERE sim >= 0.9
"""


# ---------------------------------------------------------------------------
# Exact SQL mirror of the Viterbi chooser (stages/choose.py::_viterbi): the
# forward DP carries, per candidate, BOTH the running cost and the argmin-
# backtracked chain (first-index ties = np.argmin / list_position), so no
# backward pass is needed.  All costs are exact int64 (squared centroid
# distances + integer switch penalty), so numpy-float64 and DuckDB-BIGINT
# arithmetic agree bit-for-bit.  Every CTE a recursive block reads is
# MATERIALIZED — DuckDB otherwise re-evaluates it per iteration.
# ---------------------------------------------------------------------------

_SQL_CHOOSE_STEPS = f"""
tiles AS MATERIALIZED ({td.TILES_SQL}),
epts AS MATERIALIZED (
  SELECT CAST(user_id AS BIGINT) AS user_id, CAST(event_id AS BIGINT) AS seq,
         CAST((event_id * 48271 + user_id * 977) % 65536 AS BIGINT) AS px,
         CAST((event_id * 69621 + 13) % 65536 AS BIGINT) AS py
  FROM events
),
cand AS MATERIALIZED (
  SELECT e.user_id, e.seq, t.tile_id,
         (e.px - t.cx)*(e.px - t.cx) + (e.py - t.cy)*(e.py - t.cy) AS d2,
         ROW_NUMBER() OVER (
           PARTITION BY e.user_id, e.seq
           ORDER BY (e.px - t.cx)*(e.px - t.cx) + (e.py - t.cy)*(e.py - t.cy), t.tile_id
         ) AS rnk
  FROM epts e JOIN tiles t
    ON e.px BETWEEN t.cx - t.hw AND t.cx + t.hw
   AND e.py BETWEEN t.cy - t.hh AND t.cy + t.hh
),
steps AS MATERIALIZED (
  SELECT user_id, seq,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY seq) AS BIGINT) AS si,
         list(CAST(tile_id AS BIGINT) ORDER BY rnk) AS ts,
         list(CAST(d2 AS BIGINT) ORDER BY rnk) AS cs
  FROM cand WHERE rnk <= 16
  GROUP BY user_id, seq
),
mx AS MATERIALIZED (SELECT user_id, MAX(si) AS m FROM steps GROUP BY user_id)"""


_SQL_CHOOSE_CORE = _SQL_CHOOSE_STEPS + """,
dp AS (  -- forward Viterbi carrying the argmin-backtracked chain in-state
  SELECT user_id, si, cs AS cost, ts, [[t] FOR t IN ts] AS paths
  FROM steps WHERE si = 1
  UNION ALL
  SELECT s.user_id, s.si,
         [ list_min(l.tr[j+1]) + s.cs[j+1] FOR j IN range(len(s.ts)) ] AS cost,
         s.ts,
         [ d.paths[list_position(l.tr[j+1], list_min(l.tr[j+1]))] || [s.ts[j+1]]
           FOR j IN range(len(s.ts)) ] AS paths
  FROM dp d
  JOIN steps s ON s.user_id = d.user_id AND s.si = d.si + 1,
  LATERAL (SELECT [ [ d.cost[i+1] + CASE WHEN d.ts[i+1] = s.ts[j+1] THEN 0 ELSE 10000000 END
                      FOR i IN range(len(d.ts)) ]
                    FOR j IN range(len(s.ts)) ] AS tr) l
),
fin AS MATERIALIZED (
  SELECT d.user_id, d.paths[list_position(d.cost, list_min(d.cost))] AS path
  FROM dp d JOIN mx USING (user_id) WHERE d.si = mx.m
)"""


def q_choose_path(sf_dir: str):
    """Chunked sequential path selection per user shape: one chosen tile per
    ordered event point, continuity-penalized — ≙ chooseShstMatchesForShape
    (see stages/choose.py)."""
    from ..stages.choose import viterbi_choose

    pts = _event_shapes(sf_dir)

    def _seq(batch: pa.Table) -> pa.Table:
        # sequence index inside the shape comes from (ts, event_id) order;
        # use event_id as a deterministic sequence surrogate (monotone enough
        # for grouping; the chooser re-sorts per shape anyway)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "seq": batch["event_id"],
                "ex": batch["ex"],
                "ey": batch["ey"],
            }
        )

    segs = pts.map_batches(_seq, batch_format="pyarrow", batch_size=8192)
    return viterbi_choose(segs, conflation.tiles_ref(sf_dir), "user_id", "seq", "ex", "ey")


SQL_CHOOSE_PATH = "WITH RECURSIVE " + _SQL_CHOOSE_CORE + """,
chosen AS (  -- unnest the winning chain back to (si, tile_id) rows
  SELECT user_id, generate_subscripts(path, 1) AS si, unnest(path) AS tile_id
  FROM fin
)
SELECT e.user_id, e.seq,
       CAST(COALESCE(c.tile_id, -1) AS BIGINT) AS tile_id,
       CAST(COALESCE(len(s.ts), 0) AS BIGINT) AS n_candidates
FROM epts e
LEFT JOIN steps s ON s.user_id = e.user_id AND s.seq = e.seq
LEFT JOIN chosen c ON c.user_id = s.user_id AND c.si = s.si
"""


def q_path_dijkstra(sf_dir: str):
    """Graph-native path construction (reference fidelity option, see
    ``stages/graphpaths.py``): per-order match subgraph → every source→sink
    shortest path, deterministic min-predecessor backtracking, one row per
    path step. Edge weights are the integer stand-in for the reference's
    len×rmsd (``getEdgeWeight``, buildShstMatchSubGraphsPerGtfsShapeSegment
    .js:34-44). Parity vs the Viterbi chain DP is pinned in
    tests/test_graphpaths.py."""
    from ..stages.graphpaths import dijkstra_paths

    li = _rp(sf_dir, "lineitem",
             ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"])

    def _edges(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ln = batch["l_linenumber"].to_numpy(zero_copy_only=False).astype(np.int64)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "group_key": ok,
                "src": (pk * 7 + ln) % 12,
                "dst": (sk * 11 + ln * 3) % 12,
                "w": 1 + (pk * 31 + sk * 17) % 97,
                "eid": pk * 1009 + sk * 13 + ln,
            }
        )

    edges = li.map_batches(_edges, batch_format="pyarrow", batch_size=8192)
    return dijkstra_paths(edges, "group_key", "src", "dst", "w", "eid",
                          n_slots=12, est_rows=_nrows(sf_dir, "lineitem"))


# Exact mirror of stages/graphpaths.py: 12-slot dist vector carried as a
# list through 12 Bellman-Ford rounds (fixpoint for V<=12), predecessor =
# MIN u achieving dist(u)+w = dist(v) post-fixpoint, path by backtracking.
SQL_PATH_DIJKSTRA = """
WITH RECURSIVE
li AS (
  SELECT l_orderkey AS gk,
         (l_partkey * 7 + l_linenumber) % 12  AS src,
         (l_suppkey * 11 + l_linenumber * 3) % 12 AS dst,
         1 + (l_partkey * 31 + l_suppkey * 17) % 97 AS w,
         l_partkey * 1009 + l_suppkey * 13 + l_linenumber AS eid
  FROM lineitem
),
edges AS MATERIALIZED (  -- self-loops out; parallel edges -> lightest (w, eid)
  SELECT gk, src, dst, w FROM (
    SELECT gk, src, dst, w,
           ROW_NUMBER() OVER (PARTITION BY gk, src, dst ORDER BY w, eid) AS rn
    FROM li WHERE src <> dst) WHERE rn = 1
),
deg AS MATERIALIZED (
  SELECT gk, v,
         BOOL_OR(isin) AS has_in, BOOL_OR(isout) AS has_out
  FROM (SELECT gk, src AS v, FALSE AS isin, TRUE AS isout FROM edges
        UNION ALL
        SELECT gk, dst AS v, TRUE, FALSE FROM edges)
  GROUP BY gk, v
),
eg AS MATERIALIZED (
  SELECT gk, list(src ORDER BY src, dst) AS es,
             list(dst ORDER BY src, dst) AS ed,
             list(w   ORDER BY src, dst) AS ew
  FROM edges GROUP BY gk
),
dp AS (  -- Bellman-Ford: dl[k+1] = dist to node k (BIG = unreachable)
  SELECT d.gk, d.v AS src, 0 AS it,
         [CASE WHEN k = d.v THEN CAST(0 AS BIGINT)
               ELSE CAST(4611686018427387904 AS BIGINT) END
          FOR k IN range(12)] AS dl
  FROM deg d WHERE NOT d.has_in
  UNION ALL
  SELECT p.gk, p.src, p.it + 1,
         [ least(p.dl[k+1],
                 COALESCE(list_min([ p.dl[g.es[i+1]+1] + g.ew[i+1]
                                     FOR i IN range(len(g.es))
                                     IF g.ed[i+1] = k
                                        AND p.dl[g.es[i+1]+1]
                                            < 4611686018427387904 ]),
                          CAST(4611686018427387904 AS BIGINT)))
           FOR k IN range(12) ] AS dl
  FROM dp p JOIN eg g USING (gk)
  WHERE p.it < 12
),
fin AS MATERIALIZED (SELECT gk, src, dl FROM dp WHERE it = 12),
preds AS MATERIALIZED (  -- min u achieving dist(u) + w = dist(v)
  SELECT f.gk, f.src, e.dst AS v, MIN(e.src) AS pred
  FROM fin f JOIN edges e ON e.gk = f.gk
  WHERE f.dl[e.src+1] < 4611686018427387904
    AND f.dl[e.src+1] + e.w = f.dl[e.dst+1]
  GROUP BY f.gk, f.src, e.dst
),
pairs AS MATERIALIZED (  -- every (source, sink) with finite directed distance
  SELECT f.gk, f.src, d.v AS dst, f.dl[d.v+1] AS dist_w
  FROM fin f JOIN deg d USING (gk)
  WHERE NOT d.has_out AND d.v <> f.src
    AND f.dl[d.v+1] < 4611686018427387904
),
walk AS (  -- backtrack the predecessor chain from each sink
  SELECT gk, src, dst, dst AS v, 0 AS back FROM pairs
  UNION ALL
  SELECT w.gk, w.src, w.dst, p.pred AS v, w.back + 1
  FROM walk w JOIN preds p
    ON p.gk = w.gk AND p.src = w.src AND p.v = w.v
  WHERE w.v <> w.src AND w.back < 12
),
plen AS (SELECT gk, src, dst, MAX(back) AS n_back
         FROM walk GROUP BY gk, src, dst)
SELECT w.gk AS group_key,
       CAST(w.src AS BIGINT) AS src_node,
       CAST(w.dst AS BIGINT) AS dst_node,
       CAST(p.dist_w AS BIGINT) AS dist_w,
       CAST(l.n_back - w.back + 1 AS BIGINT) AS si,
       CAST(w.v AS BIGINT) AS node
FROM walk w
JOIN plen l ON l.gk = w.gk AND l.src = w.src AND l.dst = w.dst
JOIN pairs p ON p.gk = w.gk AND p.src = w.src AND p.dst = w.dst
"""


def q_trajectory_match_hmm(sf_dir: str):
    """Sequence-aware HMM map matching per user trajectory (T2/T4/T5 parity
    with the reference's OSRM ``.match()`` recovery,
    ``replaceFeaturesGeomsWithOsrmRoute.js:44-126``): emission = squared
    centroid distance, transition = gap-feasibility
    ``64*|L1(tile_gap) - L1(obs_gap)|`` — see ``stages.choose.hmm_match``.
    Integer-exact, so the recursive-CTE oracle reproduces the DP
    bit-for-bit; verified against brute-force chain enumeration in
    tests/test_choose.py."""
    from ..stages.choose import hmm_match

    pts = _event_shapes(sf_dir)

    def _seq(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "seq": batch["event_id"],
                "ex": batch["ex"],
                "ey": batch["ey"],
            }
        )

    segs = pts.map_batches(_seq, batch_format="pyarrow", batch_size=8192)
    return hmm_match(segs, conflation.tiles_ref(sf_dir), "user_id", "seq",
                     "ex", "ey", gap_weight=64)


# Exact mirror of stages/choose.py::_viterbi_hmm: the dp rows carry each
# step's observation coords (px, py) and candidate centroid lists (xs, ys);
# the LATERAL transition matrix prices every (i -> j) extension at
# 64 * |L1(centroid_i, centroid_j) - L1(obs_prev, obs_now)| — the HMM
# gap-feasibility cost. list_position(list_min) = first-min tie-break =
# np.argmin over (d2, tile_id)-presorted candidates.
SQL_TRAJECTORY_MATCH_HMM = "WITH RECURSIVE " + f"""
tiles AS MATERIALIZED ({td.TILES_SQL}),
epts AS MATERIALIZED (
  SELECT CAST(user_id AS BIGINT) AS user_id, CAST(event_id AS BIGINT) AS seq,
         CAST((event_id * 48271 + user_id * 977) % 65536 AS BIGINT) AS px,
         CAST((event_id * 69621 + 13) % 65536 AS BIGINT) AS py
  FROM events
),
cand AS MATERIALIZED (
  SELECT e.user_id, e.seq, e.px, e.py, t.tile_id,
         CAST(t.cx AS BIGINT) AS cx, CAST(t.cy AS BIGINT) AS cy,
         (e.px - t.cx)*(e.px - t.cx) + (e.py - t.cy)*(e.py - t.cy) AS d2,
         ROW_NUMBER() OVER (
           PARTITION BY e.user_id, e.seq
           ORDER BY (e.px - t.cx)*(e.px - t.cx) + (e.py - t.cy)*(e.py - t.cy), t.tile_id
         ) AS rnk
  FROM epts e JOIN tiles t
    ON e.px BETWEEN t.cx - t.hw AND t.cx + t.hw
   AND e.py BETWEEN t.cy - t.hh AND t.cy + t.hh
),
steps AS MATERIALIZED (
  SELECT user_id, seq, MIN(px) AS px, MIN(py) AS py,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY seq) AS BIGINT) AS si,
         list(CAST(tile_id AS BIGINT) ORDER BY rnk) AS ts,
         list(CAST(d2 AS BIGINT) ORDER BY rnk) AS cs,
         list(cx ORDER BY rnk) AS xs,
         list(cy ORDER BY rnk) AS ys
  FROM cand WHERE rnk <= 16
  GROUP BY user_id, seq
),
mx AS MATERIALIZED (SELECT user_id, MAX(si) AS m FROM steps GROUP BY user_id),
dp AS (
  SELECT user_id, si, px, py, cs AS cost, ts, xs, ys,
         [[t] FOR t IN ts] AS paths
  FROM steps WHERE si = 1
  UNION ALL
  SELECT s.user_id, s.si, s.px, s.py,
         [ list_min(l.tr[j+1]) + s.cs[j+1] FOR j IN range(len(s.ts)) ] AS cost,
         s.ts, s.xs, s.ys,
         [ d.paths[list_position(l.tr[j+1], list_min(l.tr[j+1]))] || [s.ts[j+1]]
           FOR j IN range(len(s.ts)) ] AS paths
  FROM dp d
  JOIN steps s ON s.user_id = d.user_id AND s.si = d.si + 1,
  LATERAL (SELECT [ [ d.cost[i+1]
                      + 64 * abs( (abs(d.xs[i+1] - s.xs[j+1])
                                   + abs(d.ys[i+1] - s.ys[j+1]))
                                  - (abs(d.px - s.px) + abs(d.py - s.py)) )
                      FOR i IN range(len(d.ts)) ]
                    FOR j IN range(len(s.ts)) ] AS tr) l
),
fin AS MATERIALIZED (
  SELECT d.user_id, d.paths[list_position(d.cost, list_min(d.cost))] AS path
  FROM dp d JOIN mx USING (user_id) WHERE d.si = mx.m
),
chosen AS (
  SELECT user_id, generate_subscripts(path, 1) AS si, unnest(path) AS tile_id
  FROM fin
)
SELECT e.user_id, e.seq,
       CAST(COALESCE(c.tile_id, -1) AS BIGINT) AS tile_id,
       CAST(COALESCE(len(s.ts), 0) AS BIGINT) AS n_candidates
FROM epts e
LEFT JOIN steps s ON s.user_id = e.user_id AND s.seq = e.seq
LEFT JOIN chosen c ON c.user_id = s.user_id AND c.si = s.si
"""


_hmm_head, _hmm_tail = SQL_TRAJECTORY_MATCH_HMM.rsplit(
    "\nSELECT e.user_id, e.seq,", 1)
# wrap trajectory_match_hmm's final SELECT as a CTE and measure the
# centroid-chain replacement geometry it implies
SQL_TRAJECTORY_ROUTE_GEOMETRY = (_hmm_head + """,
assigned AS (
SELECT e.user_id, e.seq,""" + _hmm_tail + """
),
m AS (
  SELECT a.user_id, a.seq, t.cx, t.cy, e.px, e.py
  FROM assigned a
  JOIN tiles t ON t.tile_id = a.tile_id
  JOIN epts e ON e.user_id = a.user_id AND e.seq = a.seq
  WHERE a.tile_id >= 0
),
seqd AS (
  SELECT user_id, cx, cy, px, py,
         lead(cx) OVER w AS ncx, lead(cy) OVER w AS ncy,
         lead(px) OVER w AS npx, lead(py) OVER w AS npy
  FROM m WINDOW w AS (PARTITION BY user_id ORDER BY seq)
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_matched,
       CAST(COALESCE(SUM(CASE WHEN ncx IS NOT NULL
                               THEN abs(ncx - cx) + abs(ncy - cy) END), 0)
            AS BIGINT) AS route_len_l1,
       CAST(COALESCE(SUM(CASE WHEN npx IS NOT NULL
                               THEN abs(npx - px) + abs(npy - py) END), 0)
            AS BIGINT) AS obs_len_l1
FROM seqd GROUP BY user_id
""")


def q_choose_score(sf_dir: str):
    """Score each shape's chosen tile chain against the shape (Step C):
    integer-exact discrete-Fréchet² between the stride-picked shape polyline
    and the chosen tiles' centroid chain."""
    from ..stages.choose import choose_and_score

    pts = _event_shapes(sf_dir)

    def _seq(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "seq": batch["event_id"],
                "ex": batch["ex"],
                "ey": batch["ey"],
            }
        )

    segs = pts.map_batches(_seq, batch_format="pyarrow", batch_size=8192)
    return choose_and_score(segs, conflation.tiles_ref(sf_dir), "user_id", "seq",
                            "ex", "ey")


SQL_CHOOSE_SCORE = "WITH RECURSIVE " + _SQL_CHOOSE_CORE + """,
chosen AS MATERIALIZED (
  SELECT user_id, generate_subscripts(path, 1) AS si, unnest(path) AS tile_id
  FROM fin
),
shp AS MATERIALIZED (  -- the shape polyline in seq order
  SELECT user_id, COUNT(*) AS n_points,
         list(px ORDER BY seq) AS sx, list(py ORDER BY seq) AS sy
  FROM epts GROUP BY user_id
),
pathc AS MATERIALIZED (  -- the chosen chain's tile-centroid polyline
  SELECT c.user_id, COUNT(*) AS n_matched,
         list(CAST(t.cx AS BIGINT) ORDER BY c.si) AS bx,
         list(CAST(t.cy AS BIGINT) ORDER BY c.si) AS "by"
  FROM chosen c JOIN tiles t USING (tile_id)
  GROUP BY c.user_id
),
picked AS MATERIALIZED (  -- stride_pick both curves to 32 vertices
  SELECT s.user_id,
         [s.sx[1 + _j * (len(s.sx) - 1) // 31] FOR _j IN range(32)] AS pax,
         [s.sy[1 + _j * (len(s.sy) - 1) // 31] FOR _j IN range(32)] AS pay,
         [p.bx[1 + _j * (len(p.bx) - 1) // 31] FOR _j IN range(32)] AS pbx,
         [p."by"[1 + _j * (len(p."by") - 1) // 31] FOR _j IN range(32)] AS pby
  FROM shp s JOIN pathc p USING (user_id)
  WHERE p.n_matched >= 2
),
""" + _SQL_FRECHET_DP + """
SELECT s.user_id,
       CAST(s.n_points AS BIGINT) AS n_points,
       CAST(COALESCE(p.n_matched, 0) AS BIGINT) AS n_matched,
       CAST(COALESCE(f.cur[1], -1) AS BIGINT) AS frechet_sq
FROM shp s
LEFT JOIN pathc p USING (user_id)
LEFT JOIN (SELECT user_id, cur FROM fr WHERE k = 62) f USING (user_id)
"""


def q_choose_path_topk(sf_dir: str):  # exact oracle (struct-list k-best DP)
    """Top-3 Viterbi chains per shape — the bounded analog of the
    reference's all source→sink path enumeration
    (``createPathLineStrings.js:47-78``) for branching candidate graphs.
    Verified against brute-force enumeration in tests/test_choose.py."""
    from ..stages.choose import viterbi_choose_topk

    pts = _event_shapes(sf_dir)

    def _seq(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "seq": batch["event_id"],
                "ex": batch["ex"],
                "ey": batch["ey"],
            }
        )

    segs = pts.map_batches(_seq, batch_format="pyarrow", batch_size=8192)
    return viterbi_choose_topk(segs, conflation.tiles_ref(sf_dir), "user_id",
                               "seq", "ex", "ey", k=3)


# Exact SQL mirror of the K-BEST Viterbi (stages/choose.py::_viterbi_topk):
# the DP state per (shape, step) is a flat list of {c:cost, ic:index-chain,
# tc:tile-chain} structs — per new candidate j the extensions of every carried
# entry are sorted by (cost, index-chain) [struct field order = compare order]
# and truncated to k, exactly the engine's per-candidate top-k retention; the
# final rank order is the same (cost, lex-chain) sort over the flattened
# state.  All costs are exact int64, so numpy and DuckDB agree bit-for-bit.
SQL_CHOOSE_PATH_TOPK = "WITH RECURSIVE " + _SQL_CHOOSE_STEPS + """,
dpk AS (  -- k-best forward Viterbi; k = 3
  SELECT user_id, si,
         [{'c': cs[j+1], 'ic': [j], 'tc': [ts[j+1]]}
          FOR j IN range(len(ts))] AS st
  FROM steps WHERE si = 1
  UNION ALL
  SELECT s.user_id, s.si,
         flatten([
           list_sort([ {'c': e.c
                             + (CASE WHEN e.tc[len(e.tc)] = s.ts[j+1]
                                     THEN 0 ELSE 10000000 END)
                             + s.cs[j+1],
                        'ic': e.ic || [j],
                        'tc': e.tc || [s.ts[j+1]]}
                       FOR e IN d.st ])[1:3]
           FOR j IN range(len(s.ts)) ]) AS st
  FROM dpk d JOIN steps s ON s.user_id = d.user_id AND s.si = d.si + 1
),
fink AS MATERIALIZED (
  SELECT d.user_id, list_sort(d.st)[1:3] AS best
  FROM dpk d JOIN mx USING (user_id) WHERE d.si = mx.m
),
ranked AS MATERIALIZED (
  SELECT user_id, generate_subscripts(best, 1) AS rank, unnest(best) AS ent
  FROM fink
),
chain AS (
  SELECT user_id, rank, ent.c AS total_cost,
         generate_subscripts(ent.tc, 1) AS si, unnest(ent.tc) AS tile_id
  FROM ranked
)
SELECT c.user_id, CAST(c.rank AS BIGINT) AS rank,
       CAST(c.total_cost AS BIGINT) AS total_cost, s.seq,
       CAST(c.tile_id AS BIGINT) AS tile_id
FROM chain c JOIN steps s ON s.user_id = c.user_id AND s.si = c.si
"""


def q_choose_path_edges(sf_dir: str):
    """Path-decomposition data model (reference Step B output,
    ``gtfs_shape_shst_match_paths`` 4-level index) — one row per path EDGE:
    (user_id, path_index, path_edge_index, tile_id, seq_start, seq_end,
    n_pts). See ``stages.choose.path_decompose``."""
    from ..stages.choose import path_decompose

    return path_decompose(_event_shapes(sf_dir), conflation.tiles_ref(sf_dir),
                          est_rows=_nrows(sf_dir, "events"))


_PATH_EDGE_CTES = _CTES + """
, pts AS (
  SELECT user_id, ts, event_id,
         (event_id * 48271 + user_id * 977) % 65536 AS ex,
         (event_id * 69621 + 13) % 65536 AS ey,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pt_seq
  FROM events
),
pip AS (
  SELECT p.user_id, p.pt_seq, t.tile_id,
         ROW_NUMBER() OVER (
           PARTITION BY p.user_id, p.pt_seq
           ORDER BY (p.ex - t.cx) * (p.ex - t.cx) + (p.ey - t.cy) * (p.ey - t.cy), t.tile_id
         ) AS rn
  FROM pts p JOIN tiles t
    ON p.ex BETWEEN t.cx - t.hw AND t.cx + t.hw
   AND p.ey BETWEEN t.cy - t.hh AND t.cy + t.hh
),
m AS (
  SELECT p.user_id, p.pt_seq, p.ex, p.ey, b.tile_id
  FROM pts p LEFT JOIN (SELECT user_id, pt_seq, tile_id FROM pip WHERE rn = 1) b
    ON p.user_id = b.user_id AND p.pt_seq = b.pt_seq
),
f AS (
  SELECT user_id, pt_seq, ex, ey, tile_id,
         lag(tile_id) OVER (PARTITION BY user_id ORDER BY pt_seq) AS prev_tile
  FROM m
),
g AS (
  SELECT user_id, pt_seq, ex, ey, tile_id,
         CAST(SUM(CASE WHEN prev_tile IS NULL THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY pt_seq) AS BIGINT) - 1 AS path_index,
         CAST(SUM(CASE WHEN prev_tile IS NULL OR prev_tile <> tile_id THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY pt_seq) AS BIGINT) AS edge_ctr
  FROM f WHERE tile_id IS NOT NULL
),
edges AS (
  SELECT user_id, path_index,
         edge_ctr - MIN(edge_ctr) OVER (PARTITION BY user_id, path_index) AS path_edge_index,
         tile_id, pt_seq, ex, ey
  FROM g
)
"""


SQL_CHOOSE_PATH_EDGES = _PATH_EDGE_CTES + """
SELECT user_id, path_index, path_edge_index, tile_id,
       MIN(pt_seq) AS seq_start, MAX(pt_seq) AS seq_end, COUNT(*) AS n_pts
FROM edges GROUP BY 1, 2, 3, 4
"""


def q_path_sequentiality(sf_dir: str):
    """Gap + relative-direction comparator between consecutive decomposed
    paths (integer-exact sequentiality; see
    ``stages.choose.path_sequentiality``). The result is pair-count sized
    (small), and can be legitimately EMPTY when every shape decomposes into
    a single path (dense tile coverage) — Ray drops the schema of an
    all-empty pandas-block dataset, so the empty case returns a typed
    zero-row Arrow table matching the oracle's columns."""
    from ..stages.choose import path_sequentiality

    ds = path_sequentiality(_event_shapes(sf_dir), conflation.tiles_ref(sf_dir),
                            est_rows=_nrows(sf_dir, "events"))
    df = ds.to_pandas()
    if len(df.columns) == 0:
        cols = ["user_id", "path_index", "gap_d2", "dir_dot", "dir_cross", "pair_valid"]
        return pa.table({c: pa.array([], type=pa.int64()) for c in cols})
    return df


SQL_PATH_SEQUENTIALITY = _PATH_EDGE_CTES + """
, p2 AS (
  SELECT user_id, path_index, MIN(pt_seq) AS fs, MAX(pt_seq) AS ls
  FROM edges GROUP BY 1, 2
),
pair AS (
  SELECT a.user_id, a.path_index, a.fs AS afs, a.ls AS als, b.fs AS bfs, b.ls AS bls
  FROM p2 a JOIN p2 b ON a.user_id = b.user_id AND b.path_index = a.path_index + 1
)
SELECT pr.user_id, pr.path_index,
       (cb.ex - ca.ex) * (cb.ex - ca.ex) + (cb.ey - ca.ey) * (cb.ey - ca.ey) AS gap_d2,
       CASE WHEN pr.als > pr.afs AND pr.bls > pr.bfs
            THEN (ca.ex - ca1.ex) * (cb1.ex - cb.ex) + (ca.ey - ca1.ey) * (cb1.ey - cb.ey)
            ELSE 0 END AS dir_dot,
       CASE WHEN pr.als > pr.afs AND pr.bls > pr.bfs
            THEN (ca.ex - ca1.ex) * (cb1.ey - cb.ey) - (ca.ey - ca1.ey) * (cb1.ex - cb.ex)
            ELSE 0 END AS dir_cross,
       CAST(CASE WHEN pr.als > pr.afs AND pr.bls > pr.bfs THEN 1 ELSE 0 END AS BIGINT) AS pair_valid
FROM pair pr
JOIN pts ca ON ca.user_id = pr.user_id AND ca.pt_seq = pr.als
JOIN pts cb ON cb.user_id = pr.user_id AND cb.pt_seq = pr.bfs
LEFT JOIN pts ca1 ON ca1.user_id = pr.user_id AND ca1.pt_seq = pr.als - 1
LEFT JOIN pts cb1 ON cb1.user_id = pr.user_id AND cb1.pt_seq = pr.bfs + 1
"""


def _event_shapes_typed(sf_dir: str):
    """Event-derived points WITH event_type (stop markers for TripTracker)."""
    ev = _rp(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def _pts(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": uid,
                "ts": batch["ts"],
                "event_id": eid,
                "ex": (eid * 48271 + uid * 977) % 65536,
                "ey": (eid * 69621 + 13) % 65536,
                "event_type": batch["event_type"],
            }
        )

    return ev.map_batches(_pts, batch_format="pyarrow", batch_size=8192)


def q_trip_traversals(sf_dir: str):
    """TripTracker FIFO stop→segment matching (see
    ``stages.traffic.trip_traversals``)."""
    from ..stages import traffic

    return traffic.trip_traversals(_event_shapes_typed(sf_dir),
                                   est_rows=_nrows(sf_dir, "events"))


_TRAV_CTES = """WITH pts AS (
  SELECT user_id, ts, event_id,
         (event_id * 48271 + user_id * 977) % 65536 AS ex,
         (event_id * 69621 + 13) % 65536 AS ey,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pt_seq
  FROM events
),
nmax AS (SELECT user_id, MAX(pt_seq) AS np FROM pts GROUP BY 1),
segs AS (
  SELECT p.user_id, p.pt_seq AS seg_idx, p.ex, p.ey
  FROM pts p JOIN nmax USING (user_id) WHERE p.pt_seq < nmax.np
),
stops AS (
  SELECT user_id, ts,
         (event_id * 48271 + user_id * 977) % 65536 AS sx,
         (event_id * 69621 + 13) % 65536 AS sy,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS stop_seq
  FROM events WHERE event_type = 'signup'
),
snap AS (
  SELECT s.user_id, s.stop_seq, s.ts, g.seg_idx,
         ROW_NUMBER() OVER (
           PARTITION BY s.user_id, s.stop_seq
           ORDER BY (s.sx - g.ex) * (s.sx - g.ex) + (s.sy - g.ey) * (s.sy - g.ey), g.seg_idx
         ) AS rn
  FROM stops s JOIN segs g ON s.user_id = g.user_id
),
mono AS (
  SELECT user_id, stop_seq, ts,
         MAX(seg_idx) OVER (PARTITION BY user_id ORDER BY stop_seq) AS seg_idx
  FROM snap WHERE rn = 1
),
trav AS (
  SELECT user_id, stop_seq, seg_idx AS departure_seg_idx, ts AS dep_ts,
         lead(seg_idx) OVER (PARTITION BY user_id ORDER BY stop_seq) AS arrival_seg_idx,
         lead(ts) OVER (PARTITION BY user_id ORDER BY stop_seq) AS arr_ts
  FROM mono
)
"""


SQL_TRIP_TRAVERSALS = _TRAV_CTES + """
SELECT user_id, stop_seq, departure_seg_idx, arrival_seg_idx,
       epoch_us(dep_ts) // 1000000 AS departure_ts_s,
       epoch_us(arr_ts) // 1000000 AS arrival_ts_s
FROM trav WHERE arrival_seg_idx IS NOT NULL
"""


def q_trip_seg_traffic(sf_dir: str):
    """Traversal range join + exact travel-time distribution + rollup (see
    ``stages.traffic.trip_seg_traffic``)."""
    from ..stages import traffic

    return traffic.trip_seg_traffic(_event_shapes_typed(sf_dir),
                                    est_rows=_nrows(sf_dir, "events"))


SQL_TRIP_SEG_TRAFFIC = _TRAV_CTES + """
, trav2 AS (
  SELECT * FROM trav
  WHERE arrival_seg_idx IS NOT NULL AND arrival_seg_idx > departure_seg_idx
),
seglen AS (
  SELECT p.user_id, p.pt_seq AS seg_idx,
         CAST(FLOOR(sqrt(CAST((q.ex - p.ex) * (q.ex - p.ex) + (q.ey - p.ey) * (q.ey - p.ey) AS DOUBLE)) * 100 + 0.5) AS BIGINT) AS len_c
  FROM pts p JOIN pts q ON q.user_id = p.user_id AND q.pt_seq = p.pt_seq + 1
),
x AS (
  SELECT t.user_id, t.stop_seq, s.seg_idx, s.len_c,
         (epoch_us(t.arr_ts) - epoch_us(t.dep_ts)) // 1000 AS tt_ms,
         CAST(SUM(s.len_c) OVER (PARTITION BY t.user_id, t.stop_seq) AS BIGINT) AS tot_c
  FROM trav2 t JOIN seglen s
    ON s.user_id = t.user_id
   AND s.seg_idx >= t.departure_seg_idx AND s.seg_idx < t.arrival_seg_idx
)
SELECT user_id, seg_idx,
       CAST(SUM(CASE WHEN tot_c > 0 THEN (tt_ms * len_c) // tot_c ELSE 0 END) AS BIGINT) AS tt_ms,
       COUNT(*) AS n_trav
FROM x GROUP BY 1, 2
"""


def q_rematch_gated(sf_dir: str):
    """Iterative re-match whose round-2 radius matches pass only through the
    similarity accept-gate (see ``stages.choose.similarity_gated_rematch``).
    The gate similarity is integer-exact (``geom.line_similarity_exact``) so
    the whole two-round match + gate has an exact DuckDB oracle."""
    from ..stages.choose import similarity_gated_rematch

    return similarity_gated_rematch(_event_shapes(sf_dir), conflation.tiles_ref(sf_dir),
                                    est_rows=_nrows(sf_dir, "events"))


# Exact SQL mirror of similarity_gated_rematch: round 1 = best containing
# tile; round 2 = nearest centroid within radius for the unmatched remainder
# (the +-radius window prefilter is lossless: any centroid within euclidean
# radius lies in the window, and a window-nearest with d2 <= radius^2 IS the
# global nearest); the accept-gate recomputes line_similarity_exact — the
# vertex-in-buffer decisions are exact int64 predicates (cross^2 <= buf2*L2
# with the same 742e6 overflow clamp as the kernel), lengths are cents via
# correctly-rounded sqrt, and the final float ops repeat the kernel's exact
# IEEE sequence.
SQL_REMATCH_GATED = f"""
WITH tiles AS ({td.TILES_SQL}),
ptsr AS (
  SELECT CAST(user_id AS BIGINT) AS user_id,
         CAST((event_id * 48271 + user_id * 977) % 65536 AS BIGINT) AS px,
         CAST((event_id * 69621 + 13) % 65536 AS BIGINT) AS py,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS BIGINT) AS si
  FROM events
),
r1 AS (
  SELECT user_id, si, tile_id, cx, cy FROM (
    SELECT p.user_id, p.si, t.tile_id, t.cx, t.cy,
           ROW_NUMBER() OVER (PARTITION BY p.user_id, p.si
             ORDER BY (p.px-t.cx)*(p.px-t.cx)+(p.py-t.cy)*(p.py-t.cy), t.tile_id) AS rn
    FROM ptsr p JOIN tiles t
      ON p.px BETWEEN t.cx - t.hw AND t.cx + t.hw
     AND p.py BETWEEN t.cy - t.hh AND t.cy + t.hh
  ) WHERE rn = 1
),
r2 AS (
  SELECT user_id, si, tile_id, cx, cy FROM (
    SELECT p.user_id, p.si, t.tile_id, t.cx, t.cy,
           (p.px-t.cx)*(p.px-t.cx)+(p.py-t.cy)*(p.py-t.cy) AS d2,
           ROW_NUMBER() OVER (PARTITION BY p.user_id, p.si
             ORDER BY (p.px-t.cx)*(p.px-t.cx)+(p.py-t.cy)*(p.py-t.cy), t.tile_id) AS rn
    FROM ptsr p JOIN tiles t
      ON t.cx BETWEEN p.px - 4000 AND p.px + 4000
     AND t.cy BETWEEN p.py - 4000 AND p.py + 4000
    WHERE NOT EXISTS (SELECT 1 FROM r1 WHERE r1.user_id = p.user_id AND r1.si = p.si)
  ) WHERE rn = 1 AND d2 <= 16000000
),
m2 AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2),
cnts AS (
  SELECT b.user_id, b.n_points,
         COALESCE(c1.n, 0) AS n_r1,
         COALESCE(cm.n, 0) - COALESCE(c1.n, 0) AS n_r2,
         COALESCE(cm.n, 0) AS n_m2
  FROM (SELECT user_id, COUNT(*) AS n_points FROM ptsr GROUP BY 1) b
  LEFT JOIN (SELECT user_id, COUNT(*) AS n FROM r1 GROUP BY 1) c1 USING (user_id)
  LEFT JOIN (SELECT user_id, COUNT(*) AS n FROM m2 GROUP BY 1) cm USING (user_id)
),
a0 AS (SELECT user_id, px AS a0x, py AS a0y FROM ptsr WHERE si = 1),
b0 AS (SELECT user_id, min_by(cx, si) AS b0x, min_by(cy, si) AS b0y
       FROM m2 GROUP BY user_id),
ch AS (
  SELECT user_id, si, cx, cy,
         LEAD(cx) OVER w AS nx, LEAD(cy) OVER w AS ny
  FROM m2 WINDOW w AS (PARTITION BY user_id ORDER BY si)
),
segs2 AS (  -- chain segments translated to the shape's start
  SELECT c.user_id,
         c.cx - b.b0x + a.a0x AS s0x, c.cy - b.b0y + a.a0y AS s0y,
         c.nx - b.b0x + a.a0x AS s1x, c.ny - b.b0y + a.a0y AS s1y
  FROM ch c JOIN a0 a USING (user_id) JOIN b0 b USING (user_id)
  WHERE c.nx IS NOT NULL
),
win AS (  -- shape vertex within buffer of the translated chain?
  SELECT p.user_id, p.si, MAX(CASE WHEN l2.ok THEN 1 ELSE 0 END) AS w
  FROM ptsr p JOIN segs2 s ON s.user_id = p.user_id,
  LATERAL (SELECT (s.s1x-s.s0x)*(s.s1x-s.s0x) + (s.s1y-s.s0y)*(s.s1y-s.s0y) AS L2,
                  (p.px-s.s0x)*(s.s1x-s.s0x) + (p.py-s.s0y)*(s.s1y-s.s0y) AS dt,
                  (p.px-s.s0x)*(p.px-s.s0x) + (p.py-s.s0y)*(p.py-s.s0y) AS d0,
                  (p.px-s.s1x)*(p.px-s.s1x) + (p.py-s.s1y)*(p.py-s.s1y) AS d1,
                  (p.px-s.s0x)*(s.s1y-s.s0y) - (p.py-s.s0y)*(s.s1x-s.s0x) AS crs) l1,
  LATERAL (SELECT CASE WHEN l1.L2 = 0 OR l1.dt <= 0 THEN l1.d0 <= 4000000
                       WHEN l1.dt >= l1.L2 THEN l1.d1 <= 4000000
                       WHEN abs(l1.crs) > 742000000 THEN false
                       ELSE l1.crs * l1.crs <= 4000000 * l1.L2 END AS ok) l2
  GROUP BY p.user_id, p.si
),
sims AS (
  SELECT p.user_id,
         SUM(CAST(FLOOR(sqrt(CAST((n.px-p.px)*(n.px-p.px) + (n.py-p.py)*(n.py-p.py)
                                  AS DOUBLE)) * 100 + 0.5) AS BIGINT))
       - SUM(CASE WHEN w1.w = 1 AND w2.w = 1
                  THEN CAST(FLOOR(sqrt(CAST((n.px-p.px)*(n.px-p.px) + (n.py-p.py)*(n.py-p.py)
                                            AS DOUBLE)) * 100 + 0.5) AS BIGINT)
                  ELSE 0 END) AS diff_c
  FROM ptsr p
  JOIN ptsr n ON n.user_id = p.user_id AND n.si = p.si + 1
  LEFT JOIN win w1 ON w1.user_id = p.user_id AND w1.si = p.si
  LEFT JOIN win w2 ON w2.user_id = p.user_id AND w2.si = n.si
  GROUP BY p.user_id
),
gate AS (
  SELECT user_id,
         CASE WHEN sim <= 6000000.0 THEN 1 ELSE 0 END AS accepted,
         CAST(FLOOR(LEAST(sim, 1000000000000.0) * 100 + 0.5) AS BIGINT) AS sim_q2
  FROM (
    SELECT c.user_id,
           CAST(s.diff_c AS DOUBLE)
           * ((1.0 + sqrt(CAST((a.a0x-b.b0x)*(a.a0x-b.b0x) + (a.a0y-b.b0y)*(a.a0y-b.b0y) AS DOUBLE)))
            * (1.0 + sqrt(CAST((a.a0x-b.b0x)*(a.a0x-b.b0x) + (a.a0y-b.b0y)*(a.a0y-b.b0y) AS DOUBLE)))) AS sim
    FROM cnts c JOIN sims s USING (user_id)
    JOIN a0 a USING (user_id) JOIN b0 b USING (user_id)
    WHERE c.n_r2 > 0 AND c.n_m2 >= 2 AND c.n_points >= 2
  )
)
SELECT c.user_id, CAST(c.n_points AS BIGINT) AS n_points,
       CAST(c.n_r1 AS BIGINT) AS n_round1,
       CAST(CASE WHEN COALESCE(g.accepted, 0) = 1 OR c.n_r2 = 0
                 THEN c.n_r2 ELSE 0 END AS BIGINT) AS n_round2,
       CAST(COALESCE(g.accepted, 0) AS BIGINT) AS accepted,
       CAST(COALESCE(g.sim_q2, -1) AS BIGINT) AS sim_q2
FROM cnts c LEFT JOIN gate g USING (user_id)
"""


def q_path_metadata_merge(sf_dir: str):
    """Metadata-overlap path splicing to fixpoint over the decomposed paths
    (see ``stages.choose.path_metadata_merge``). Pure-integer id-sequence
    fixpoint -> exact recursive-SQL oracle below."""
    from ..stages.choose import path_metadata_merge

    return path_metadata_merge(_event_shapes(sf_dir), conflation.tiles_ref(sf_dir),
                               est_rows=_nrows(sf_dir, "events"))


# Exact SQL mirror of geom.merge_paths_by_ids over the decomposed paths.
# DuckDB 1.0 cannot bind list columns of a RECURSIVE CTE inside nested
# lambdas, so the fixpoint is UNROLLED as chained step CTEs (each path-count-
# reducing iteration shrinks the per-shape list, so #steps bounds #paths —
# 28 covers every gate scale, and a non-converged shape emits n_merged = -1,
# which would fail the hash gate loudly rather than silently).  One step =
# one parallel subset-drop pass (provably equal to the engine's sequential
# drop-flag scan: subset relations are static and transitive, and equal-set
# ties keep the lowest index on both sides), else the FIRST (i, j) pair in
# index order is spliced at its LONGEST suffix-prefix overlap — the engine's
# exact scan order (pairs flattened to p = i*n + j, ascending = (i, j) lex).
def _merge_step(k: int) -> str:
    # DuckDB 1.0 cannot bind nested lambdas inside LATERAL subqueries, so the
    # intermediate bindings chain through plain sub-CTEs instead.
    return f""",
m{k}a AS (
  SELECT user_id, ps, done, CASE WHEN done THEN 0 ELSE len(ps) END AS n
  FROM m{k-1}
),
m{k}b AS (
  SELECT user_id, ps, done, n,
    [ CASE WHEN p // n = p % n THEN false
           ELSE len([1 FOR x IN ps[p // n + 1]
                     IF NOT list_contains(ps[p % n + 1], x)]) = 0 END
      FOR p IN range(n * n) ] AS sub,
    [ CASE WHEN p // n = p % n THEN 0
           ELSE COALESCE(list_max(
             [kk+1 FOR kk IN range(LEAST(len(ps[p // n + 1]), len(ps[p % n + 1])))
              IF ps[p // n + 1][len(ps[p // n + 1])-kk:len(ps[p // n + 1])]
               = ps[p % n + 1][1:kk+1]]), 0) END
      FOR p IN range(n * n) ] AS bks
  FROM m{k}a
),
m{k}c AS (
  SELECT user_id, ps, done, n, bks,
    [ i FOR i IN range(n)
      IF len([1 FOR j IN range(n)
              IF j <> i AND sub[i*n+j+1]
                 AND (NOT sub[j*n+i+1] OR j < i)]) = 0 ] AS keep,
    [ p FOR p IN range(n * n) IF bks[p+1] > 0 ][1] AS spl
  FROM m{k}b
),
m{k} AS (
  SELECT user_id,
    CASE WHEN done THEN ps
         WHEN len(keep) < len(ps) THEN [ps[t+1] FOR t IN keep]
         WHEN spl IS NOT NULL THEN
           [ps[t+1] FOR t IN range(len(ps)) IF t <> spl // n AND t <> spl % n]
           || [ps[spl // n + 1] || ps[spl % n + 1][bks[spl+1]+1:len(ps[spl % n + 1])]]
         ELSE ps END AS ps,
    done OR (len(keep) = len(ps) AND spl IS NULL) AS done
  FROM m{k}c
)"""


_MERGE_STEPS = 28

SQL_PATH_METADATA_MERGE = (_PATH_EDGE_CTES + """,
pathsq AS (
  SELECT user_id, path_index, list(tile_id ORDER BY path_edge_index) AS p
  FROM (SELECT DISTINCT user_id, path_index, path_edge_index, tile_id FROM edges)
  GROUP BY user_id, path_index
),
u0 AS MATERIALIZED (
  SELECT user_id, list(p ORDER BY path_index) AS ps,
         COUNT(*) AS n_paths, SUM(len(p)) AS n_edges_before
  FROM pathsq GROUP BY user_id
),
m0 AS (SELECT user_id, ps, len(ps) <= 1 AS done FROM u0)"""
+ "".join(_merge_step(k) for k in range(1, _MERGE_STEPS + 1)) + f"""
SELECT u0.user_id, CAST(u0.n_paths AS BIGINT) AS n_paths,
       CAST(CASE WHEN f.done THEN len(f.ps) ELSE -1 END AS BIGINT) AS n_merged,
       CAST(u0.n_edges_before AS BIGINT) AS n_edges_before,
       CAST(COALESCE(list_sum([len(p) FOR p IN f.ps]), 0) AS BIGINT) AS n_edges_after
FROM u0 JOIN m{_MERGE_STEPS} f USING (user_id)
""")


def q_choose_annealed(sf_dir: str):
    """Threshold-annealed axiomatic chooser + Viterbi remainder (see
    ``stages.choose.annealed_choose``). Jacobi sweeps + integer-exact costs
    make the whole anneal ladder SQL-mirrorable (oracle below)."""
    from ..stages.choose import annealed_choose

    return annealed_choose(_event_shapes(sf_dir), conflation.tiles_ref(sf_dir),
                           est_rows=_nrows(sf_dir, "events"))


# Exact SQL mirror of the annealed chooser (stages/choose.py::anneal_axiomatic
# + the Viterbi remainder): the recursion carries, per shape, the full chosen/
# level arrays plus the float threshold; one iteration = one SYNCHRONOUS
# (Jacobi) sweep recomputing every undecided position from the previous
# sweep's state, then fixpoint/relax/terminate bookkeeping identical to the
# engine's while-loops.  The threshold ladder repeats the SAME IEEE-double ops
# (thr = least(thr * sqrt(2), relaxed)) so numpy and DuckDB agree bit-for-bit;
# candidate costs are exact int64 squared distances.
_SQL_ANNEAL_CORE = f"""
tiles AS MATERIALIZED ({{tiles_sql}}),
eptsa AS MATERIALIZED (
  SELECT CAST(user_id AS BIGINT) AS user_id, CAST(event_id AS BIGINT) AS seq,
         CAST((event_id * 48271 + user_id * 977) % 65536 AS BIGINT) AS px,
         CAST((event_id * 69621 + 13) % 65536 AS BIGINT) AS py,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS BIGINT) AS si
  FROM events
),
canda AS MATERIALIZED (
  SELECT e.user_id, e.si, t.tile_id,
         (e.px - t.cx)*(e.px - t.cx) + (e.py - t.cy)*(e.py - t.cy) AS d2,
         ROW_NUMBER() OVER (
           PARTITION BY e.user_id, e.si
           ORDER BY (e.px - t.cx)*(e.px - t.cx) + (e.py - t.cy)*(e.py - t.cy), t.tile_id
         ) AS rnk
  FROM eptsa e JOIN tiles t
    ON e.px BETWEEN t.cx - t.hw AND t.cx + t.hw
   AND e.py BETWEEN t.cy - t.hh AND t.cy + t.hh
),
posl AS MATERIALIZED (
  SELECT user_id, si, list(CAST(tile_id AS BIGINT) ORDER BY rnk) AS ts,
         list(CAST(d2 AS BIGINT) ORDER BY rnk) AS cs
  FROM canda WHERE rnk <= 16 GROUP BY user_id, si
),
usr AS MATERIALIZED (
  SELECT e.user_id,
         list(COALESCE(p.ts, []::BIGINT[]) ORDER BY e.si) AS tsa,
         list(COALESCE(p.cs, []::BIGINT[]) ORDER BY e.si) AS csa,
         COUNT(*) AS n
  FROM eptsa e LEFT JOIN posl p ON p.user_id = e.user_id AND p.si = e.si
  GROUP BY e.user_id
),
ann AS (  -- one iteration = one Jacobi sweep + fixpoint/relax bookkeeping
  SELECT user_id, 0 AS it,
         [CAST(-1 AS BIGINT) FOR j IN range(n)] AS ch,
         [CAST(-1 AS BIGINT) FOR j IN range(n)] AS lv,
         CAST(250000.0 AS DOUBLE) AS thr, CAST(0 AS BIGINT) AS level,
         false AS done
  FROM usr
  UNION ALL
  SELECT a.user_id, a.it + 1,
         l2.ch2,
         [CASE WHEN a.ch[k+1] < 0 AND l2.ch2[k+1] >= 0 THEN a.level
               ELSE a.lv[k+1] END FOR k IN range(len(a.ch))] AS lv,
         CASE WHEN l2.ch2 <> a.ch OR a.thr >= 16000000.0 THEN a.thr
              ELSE LEAST(a.thr * sqrt(2.0), 16000000.0) END AS thr,
         CASE WHEN l2.ch2 <> a.ch OR a.thr >= 16000000.0 THEN a.level
              ELSE a.level + 1 END AS level,
         (l2.ch2 = a.ch AND a.thr >= 16000000.0) AS done
  FROM ann a JOIN usr u USING (user_id),
  LATERAL (SELECT [ [u.tsa[k+1][m+1] FOR m IN range(len(u.tsa[k+1]))
                     IF CAST(u.csa[k+1][m+1] AS DOUBLE) <= a.thr]
                    FOR k IN range(len(a.ch)) ] AS pl) l1,
  LATERAL (SELECT [ CASE WHEN a.ch[k+1] >= 0 OR len(l1.pl[k+1]) = 0 THEN a.ch[k+1]
                         ELSE COALESCE(
                           CASE WHEN list_contains(l1.pl[k+1], a.ch[k]) THEN a.ch[k] END,
                           CASE WHEN list_contains(l1.pl[k+1], a.ch[k+2]) THEN a.ch[k+2] END,
                           CASE WHEN len(l1.pl[k+1]) = 1 THEN l1.pl[k+1][1] END,
                           CAST(-1 AS BIGINT)) END
                    FOR k IN range(len(a.ch)) ] AS ch2) l2
  WHERE NOT a.done
),
fina AS MATERIALIZED (SELECT user_id, ch, lv FROM ann WHERE done),
remp AS (
  SELECT f.user_id, generate_subscripts(f.ch, 1) AS pos, unnest(f.ch) AS chv
  FROM fina f
),
rem AS MATERIALIZED (  -- undecided positions with candidates -> Viterbi chain
  SELECT r.user_id, r.pos,
         CAST(ROW_NUMBER() OVER (PARTITION BY r.user_id ORDER BY r.pos)
              AS BIGINT) AS si,
         u.tsa[r.pos] AS ts, u.csa[r.pos] AS cs
  FROM remp r JOIN usr u USING (user_id)
  WHERE r.chv < 0 AND len(u.tsa[r.pos]) > 0
),
mx2 AS MATERIALIZED (SELECT user_id, MAX(si) AS m FROM rem GROUP BY user_id),
dp2 AS (
  SELECT user_id, si, cs AS cost, ts, [[t] FOR t IN ts] AS paths
  FROM rem WHERE si = 1
  UNION ALL
  SELECT s.user_id, s.si,
         [ list_min(l.tr[j+1]) + s.cs[j+1] FOR j IN range(len(s.ts)) ] AS cost,
         s.ts,
         [ d.paths[list_position(l.tr[j+1], list_min(l.tr[j+1]))] || [s.ts[j+1]]
           FOR j IN range(len(s.ts)) ] AS paths
  FROM dp2 d JOIN rem s ON s.user_id = d.user_id AND s.si = d.si + 1,
  LATERAL (SELECT [ [ d.cost[i+1] + CASE WHEN d.ts[i+1] = s.ts[j+1] THEN 0 ELSE 10000000 END
                      FOR i IN range(len(d.ts)) ]
                    FOR j IN range(len(s.ts)) ] AS tr) l
),
fin2 AS MATERIALIZED (
  SELECT d.user_id, d.paths[list_position(d.cost, list_min(d.cost))] AS path
  FROM dp2 d JOIN mx2 USING (user_id) WHERE d.si = mx2.m
),
vit AS MATERIALIZED (
  SELECT v.user_id, r.pos, v.tile_id
  FROM (SELECT user_id, generate_subscripts(path, 1) AS vsi, unnest(path) AS tile_id
        FROM fin2) v
  JOIN rem r ON r.user_id = v.user_id AND r.si = v.vsi
)"""

SQL_CHOOSE_ANNEALED = ("WITH RECURSIVE " + _SQL_ANNEAL_CORE + """
SELECT e.user_id, e.seq,
       CAST(CASE WHEN f.ch[e.si] >= 0 THEN f.ch[e.si]
                 ELSE COALESCE(v.tile_id, -1) END AS BIGINT) AS tile_id,
       CAST(CASE WHEN f.ch[e.si] >= 0 THEN 1
                 WHEN v.tile_id IS NOT NULL THEN 2 ELSE 0 END AS BIGINT) AS decided_by,
       CAST(f.lv[e.si] AS BIGINT) AS anneal_level
FROM eptsa e JOIN fina f USING (user_id)
LEFT JOIN vit v ON v.user_id = e.user_id AND v.pos = e.si
""").replace("{tiles_sql}", td.TILES_SQL)


def q_time_parse(sf_dir: str):
    """HH:MM:SS string → seconds-into-day parser — ≙ M15
    (``TripTracker.js:13-17``; GTFS times exceed 24h). A deterministic
    time string derives from event_id in BOTH engines; the engine side
    genuinely PARSES it back with vectorized Arrow string kernels."""
    ev = _rp(sf_dir, "events", ["event_id"])

    def _mk(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hh = eid % 30  # GTFS-style: hours may pass 24
        mm = (eid * 7) % 60
        ss = (eid * 13) % 60
        tstr = pa.array([f"{h:02d}:{m:02d}:{s:02d}" for h, m, s in zip(hh, mm, ss)])
        # the parser under test: split the STRING back into components
        parts = pc.split_pattern(tstr, ":")
        flat = pc.list_flatten(parts).cast(pa.int64()).to_numpy(zero_copy_only=False)
        sec = flat[0::3] * 3600 + flat[1::3] * 60 + flat[2::3]
        return pa.table({"event_id": eid, "time_str": tstr, "sec": sec})

    return ev.map_batches(_mk, batch_format="pyarrow", batch_size=8192)


SQL_TIME_PARSE = """
WITH t AS (
  SELECT event_id,
         printf('%02d:%02d:%02d', event_id % 30, (event_id * 7) % 60,
                (event_id * 13) % 60) AS time_str
  FROM events
)
SELECT event_id, time_str,
       CAST(split_part(time_str, ':', 1) AS BIGINT) * 3600
     + CAST(split_part(time_str, ':', 2) AS BIGINT) * 60
     + CAST(split_part(time_str, ':', 3) AS BIGINT) AS sec
FROM t
"""


def q_path_linestrings(sf_dir: str):
    """Path → LineString + pathDecompositionInfo + two-algorithm union to
    fixpoint (see ``stages.choose.path_linestrings``). Id-centric: the
    polyline is the centroid chain of the id list, so the fixpoint is a
    pure-integer computation with the exact unrolled-CTE oracle below."""
    from ..stages.choose import path_linestrings

    return path_linestrings(_event_shapes(sf_dir), conflation.tiles_ref(sf_dir),
                            est_rows=_nrows(sf_dir, "events"))


# Exact SQL mirror of geom.union_paths_by_ids_geo + the path emission: the
# same unrolled step-CTE fixpoint as SQL_PATH_METADATA_MERGE (one reducing
# action per step, done-flag when none applies, -1/'NOT_CONVERGED' sentinel
# rows on step exhaustion) extended with the GEOSPATIAL merge as the
# lowest-priority action: when no subset drop and no splice exists, the
# FIRST (i, j) pair in index order whose endpoint centroids are within
# union_tol concatenates (ids i ++ j, appended at the end). Each path
# element is encoded as ONE BIGINT (tile_id * 2^32 + cx * 2^16 + cy,
# injective since 0 <= cx, cy < 65536), so subset / splice equality on the
# encoded lists equals id-list equality and the geo predicate decodes the
# endpoints with // and %. Per-edge lengths are cents of correctly-rounded
# sqrt over exact int64 squared distances — the engine repeats the identical
# IEEE sequence, and path_len_c sums the INT cents (order-free).
def _union_step(k: int, tol2: int) -> str:
    return f""",
g{k}a AS (
  SELECT user_id, ps, done, CASE WHEN done THEN 0 ELSE len(ps) END AS n
  FROM g{k-1}
),
g{k}b AS (
  SELECT user_id, ps, done, n,
    [ CASE WHEN p // n = p % n THEN false
           ELSE len([1 FOR x IN ps[p // n + 1]
                     IF NOT list_contains(ps[p % n + 1], x)]) = 0 END
      FOR p IN range(n * n) ] AS sub,
    [ CASE WHEN p // n = p % n THEN 0
           ELSE COALESCE(list_max(
             [kk+1 FOR kk IN range(LEAST(len(ps[p // n + 1]), len(ps[p % n + 1])))
              IF ps[p // n + 1][len(ps[p // n + 1])-kk:len(ps[p // n + 1])]
               = ps[p % n + 1][1:kk+1]]), 0) END
      FOR p IN range(n * n) ] AS bks,
    [ (ps[t+1][len(ps[t+1])] // 65536) % 65536 FOR t IN range(n) ] AS lxs,
    [  ps[t+1][len(ps[t+1])] % 65536           FOR t IN range(n) ] AS lys,
    [ (ps[t+1][1] // 65536) % 65536            FOR t IN range(n) ] AS fxs,
    [  ps[t+1][1] % 65536                      FOR t IN range(n) ] AS fys
  FROM g{k}a
),
g{k}c AS (
  SELECT user_id, ps, done, n, bks,
    [ i FOR i IN range(n)
      IF len([1 FOR j IN range(n)
              IF j <> i AND sub[i*n+j+1]
                 AND (NOT sub[j*n+i+1] OR j < i)]) = 0 ] AS keep,
    [ p FOR p IN range(n * n) IF bks[p+1] > 0 ][1] AS spl,
    [ p FOR p IN range(n * n)
      IF p // n <> p % n
         AND (lxs[p//n+1]-fxs[p%n+1])*(lxs[p//n+1]-fxs[p%n+1])
           + (lys[p//n+1]-fys[p%n+1])*(lys[p//n+1]-fys[p%n+1]) <= {tol2} ][1] AS geo
  FROM g{k}b
),
g{k} AS (
  SELECT user_id,
    CASE WHEN done THEN ps
         WHEN len(keep) < len(ps) THEN [ps[t+1] FOR t IN keep]
         WHEN spl IS NOT NULL THEN
           [ps[t+1] FOR t IN range(len(ps)) IF t <> spl // n AND t <> spl % n]
           || [ps[spl // n + 1] || ps[spl % n + 1][bks[spl+1]+1:len(ps[spl % n + 1])]]
         WHEN geo IS NOT NULL THEN
           [ps[t+1] FOR t IN range(len(ps)) IF t <> geo // n AND t <> geo % n]
           || [ps[geo // n + 1] || ps[geo % n + 1]]
         ELSE ps END AS ps,
    done OR (len(keep) = len(ps) AND spl IS NULL AND geo IS NULL) AS done
  FROM g{k}c
)"""


SQL_PATH_LINESTRINGS = (_PATH_EDGE_CTES + """,
pathsg AS (
  SELECT e.user_id, e.path_index,
         list((e.tile_id * 65536 + t.cx) * 65536 + t.cy
              ORDER BY e.path_edge_index) AS p
  FROM (SELECT DISTINCT user_id, path_index, path_edge_index, tile_id FROM edges) e
  JOIN tiles t USING (tile_id)
  GROUP BY e.user_id, e.path_index
),
g0 AS MATERIALIZED (
  SELECT user_id, list(p ORDER BY path_index) AS ps,
         COUNT(*) <= 1 AS done
  FROM pathsg GROUP BY user_id
)"""
+ "".join(_union_step(k, tol2=1) for k in range(1, _MERGE_STEPS + 1)) + f""",
gf AS MATERIALIZED (SELECT user_id, ps, done FROM g{_MERGE_STEPS}),
gout AS (
  SELECT user_id, generate_subscripts(ps, 1) - 1 AS path_index, unnest(ps) AS pv
  FROM gf WHERE done
),
glen AS (
  SELECT user_id, path_index, pv,
    [ CAST(FLOOR(sqrt(CAST(
        ((pv[e+1] // 65536) % 65536 - (pv[e+2] // 65536) % 65536)
      * ((pv[e+1] // 65536) % 65536 - (pv[e+2] // 65536) % 65536)
      + (pv[e+1] % 65536 - pv[e+2] % 65536)
      * (pv[e+1] % 65536 - pv[e+2] % 65536) AS DOUBLE)) * 100 + 0.5) AS BIGINT)
      FOR e IN range(len(pv) - 1) ] AS cents
  FROM gout
)
SELECT user_id,
       CAST(path_index AS BIGINT) AS path_index,
       CAST(len(pv) AS BIGINT) AS n_edges,
       CAST(COALESCE(list_sum(cents), 0) AS BIGINT) AS path_len_c,
       '[' || array_to_string(
         [ printf('{{"id":%d,"len":%d}}', pv[e+1] // 4294967296,
                  CASE WHEN e < len(pv) - 1 THEN cents[e+1] ELSE 0 END)
           FOR e IN range(len(pv)) ], ',') || ']' AS decomp_json
FROM glen
UNION ALL
SELECT user_id, CAST(-1 AS BIGINT) AS path_index, CAST(-1 AS BIGINT) AS n_edges,
       CAST(-1 AS BIGINT) AS path_len_c, 'NOT_CONVERGED' AS decomp_json
FROM gf WHERE NOT done
""")


def q_row_parity_counts(sf_dir: str):
    """Data-quality counters — ≙ A8 COUNT sanity checks
    (``RawGtfsDAO/loaders.js:87-117``): single row of global counts."""
    li = _rp(sf_dir, "lineitem", ["l_orderkey"])
    orders = _rp(sf_dir, "orders", ["o_orderkey"])
    n_li = li.count()
    n_ord = orders.count()
    # distributed left-anti count: distinct fact keys (distributed dedup) ->
    # left join -> count-where-null. The FACT-table key set never lands on
    # the driver (the round-1 `unique()` collect was O(|orders|) driver heap).
    dk = rel.distinct(li, ["l_orderkey"], est_rows=_nrows(sf_dir, "lineitem"))
    dk = dk.map_batches(
        lambda t: t.append_column("_hit", pa.array(np.ones(t.num_rows, dtype=np.int8))),
        batch_format="pyarrow",
    )
    j = orders.join(dk, "left_outer", 8, on=("o_orderkey",), right_on=("l_orderkey",))
    miss = j.map_batches(
        lambda t: pa.table({"m": pc.cast(pc.is_null(t["_hit"]), pa.int64())}),
        batch_format="pyarrow",
    )
    no_lines = int(miss.aggregate(Sum("m"))["sum(m)"] or 0)
    return pa.table(
        {
            "n_lineitems": pa.array([n_li], type=pa.int64()),
            "n_orders": pa.array([n_ord], type=pa.int64()),
            "n_orders_wo_lines": pa.array([no_lines], type=pa.int64()),
        }
    )


SQL_ROW_PARITY_COUNTS = """
SELECT (SELECT COUNT(*) FROM lineitem) AS n_lineitems,
       (SELECT COUNT(*) FROM orders) AS n_orders,
       (SELECT COUNT(*) FROM orders
        WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)) AS n_orders_wo_lines
"""


def q_doc_tfidf(sf_dir: str):
    """Per-doc distinctive terms (tf-idf-style, integer-exact ranking):
    ``textops.distinctive_terms`` — token-bucket df attach + doc-bucket
    top-k, two bounded shuffles."""
    return textops.distinctive_terms(
        _rp(sf_dir, "documents", ["doc_id", "text"]), k=5,
        est_rows=_nrows(sf_dir, "documents"))


SQL_DOC_TFIDF = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS token
  FROM documents
),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
ranked AS (
  SELECT tf.doc_id, tf.token, tf.tf, df.df,
         ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf DESC, df.df ASC, tf.token ASC) AS rk
  FROM tf JOIN df USING (token)
)
SELECT doc_id, token, tf, df, rk FROM ranked WHERE rk <= 5
"""


# ---------------------------------------------------------------------------
# multimodal audio / video stages (stages/media.py) with closed-form oracles
# ---------------------------------------------------------------------------

def q_audio_decode_features(sf_dir: str):
    """Multimodal audio decode + feature extraction (``stages/media.py``):
    square-wave clips synthesized map-side from doc_id, encoded as REAL
    RIFF/WAVE PCM16 bytes, then decoded back by the actor-pool
    ``AudioFeaturizer``. Every emitted feature is exact int64 arithmetic over
    the DECODED samples, so the oracle is the closed form of the synthesis —
    any encode/decode/plumbing defect breaks the hash. ≙ the per-row payload
    invariant of BASELINE.json applied to the audio modality."""
    docs = _rp(sf_dir, "documents", ["doc_id"])

    def _synth(batch: pa.Table) -> pa.Table:
        from ..functions import media as M

        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = []
        for i in ids:
            sr = 8000 + (i % 3) * 4000
            n = 1000 + (i * 101) % 4000
            amp = 1000 + (i * 37) % 20000
            p = 2 + i % 14
            t = np.arange(n, dtype=np.int64)
            s = np.where((t // p) % 2 == 0, amp, -amp).astype(np.int16)
            blobs.append(M.encode_wav(s, int(sr)))
        return pa.table(
            {
                "audio_id": ids,
                "bytes": pa.array(blobs, type=pa.binary()),
                "fmt": pa.array(["wav"] * len(ids), type=pa.string()),
            }
        )

    synth = docs.map_batches(_synth, batch_format="pyarrow", batch_size=512)
    feats = mstage.audio_features(synth, batch_size=512)
    return feats.select_columns(
        ["audio_id", "sr", "n_samples", "peak", "sum_sq", "n_zero_cross"]
    )


# square wave ±amp, half-period p, n samples: peak = amp, sum_sq = n*amp²,
# sign flips exactly at sample indices t ≡ 0 (mod p), t ∈ [1, n-1].
SQL_AUDIO_DECODE_FEATURES = """
SELECT doc_id AS audio_id,
       8000 + (doc_id % 3) * 4000 AS sr,
       1000 + (doc_id * 101) % 4000 AS n_samples,
       1000 + (doc_id * 37) % 20000 AS peak,
       (1000 + (doc_id * 101) % 4000)
         * (1000 + (doc_id * 37) % 20000)
         * (1000 + (doc_id * 37) % 20000) AS sum_sq,
       (999 + (doc_id * 101) % 4000) // (2 + doc_id % 14) AS n_zero_cross
FROM documents
"""


def q_video_frame_means(sf_dir: str):
    """Multimodal video frame-sampling (``stages/media.py``): seekable QVID
    clips synthesized map-side from doc_id (frame f = solid color + red
    horizontal gradient, both closed-form in (id, f)), then the actor-pool
    ``FrameSampler`` reads the container header, picks every 3rd frame, and
    decodes ONLY those frames via the seek index. Per-channel int64 pixel
    sums over the DECODED frames mirror the synthesis closed form in SQL."""
    docs = _rp(sf_dir, "documents", ["doc_id"])

    def _synth(batch: pa.Table) -> pa.Table:
        from ..functions import media as M

        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = []
        for i in ids:
            nf, w, h = int(4 + i % 28), int(16 + (i % 4) * 8), int(12 + (i % 3) * 6)
            grad = ((np.arange(w, dtype=np.int64) * 55) // (w - 1)).astype(np.uint8)
            frames = np.empty((nf, h, w, 3), dtype=np.uint8)
            for f in range(nf):
                frames[f, :, :, 0] = np.uint8((i * 7 + f * 13) % 200) + grad[None, :]
                frames[f, :, :, 1] = (i * 11 + f * 5) % 200
                frames[f, :, :, 2] = (i * 3 + f * 17) % 200
            blobs.append(M.encode_video(frames, fps=24))
        return pa.table(
            {"video_id": ids, "bytes": pa.array(blobs, type=pa.binary())}
        )

    synth = docs.map_batches(_synth, batch_format="pyarrow", batch_size=256)
    frames = mstage.sample_frames(synth, every_n=3, with_ahash=False,
                                  batch_size=256)
    return frames.select_columns(
        ["video_id", "frame_idx", "sum_r", "sum_g", "sum_b"]
    )


def q_image_decode_features(sf_dir: str):
    """Image decode + feature extraction through ALL THREE image codecs
    (real BMP, real PNG incl. zlib/filter path, deterministic QJPG stub):
    images synthesized map-side from doc_id (solid color + red gradient),
    ENCODED for real, then the actor-pool ``ImageFeaturizer`` decodes and
    emits exact int64 per-channel pixel sums. The oracle mirrors the
    synthesis closed form — including the QJPG 6-bit dequantization
    arithmetic — so a codec defect in any format breaks the hash."""
    from ..functions import codecs

    docs = _rp(sf_dir, "documents", ["doc_id"])
    fmts3 = ["bmp", "png", "jpeg"]

    def _synth(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs, fmts = [], []
        for i in ids:
            w, h = int(16 + (i % 4) * 8), int(12 + (i % 3) * 6)
            grad = ((np.arange(w, dtype=np.int64) * 55) // (w - 1)).astype(np.uint8)
            img = np.empty((h, w, 3), dtype=np.uint8)
            img[:, :, 0] = np.uint8((i * 7) % 200) + grad[None, :]
            img[:, :, 1] = (i * 11) % 200
            img[:, :, 2] = (i * 3) % 200
            fmt = fmts3[int(i % 3)]
            blobs.append(codecs.encode(img, fmt))
            fmts.append(fmt)
        return pa.table(
            {
                "image_id": ids,
                "bytes": pa.array(blobs, type=pa.binary()),
                "fmt": pa.array(fmts, type=pa.string()),
            }
        )

    synth = docs.map_batches(_synth, batch_format="pyarrow", batch_size=512)
    feats = mstage.image_features(synth, with_ahash=False, batch_size=512)
    return feats.select_columns(["image_id", "w", "h", "sum_r", "sum_g", "sum_b"])


def q_image_edge_energy(sf_dir: str):
    """Image edge energy through the decode path (``media.ImageEdgeEnergy``):
    per image, exact int64 sums of absolute neighbor differences — the L1
    gradient magnitude behind every blur/sharpness quality filter. The
    synthesis adds a VERTICAL gradient on G to the ``image_decode_features``
    fixture (horizontal on R), so both diff directions and all three codecs
    (BMP/PNG/QJPG dequant) carry signal; the engine measures the decoded
    pixels genuinely (all 6 channel×direction sums feed ``edge_total``),
    while the oracle mirrors the synthesis+codec arithmetic closed-form."""
    from ..functions import codecs

    docs = _rp(sf_dir, "documents", ["doc_id"])

    synth = docs.map_batches(_image_fixture_synth, batch_format="pyarrow", batch_size=512)
    return mstage.image_edge_energy(synth, batch_size=512)


# dequant d(v) = (v//4)*4 + (v//4)//16 is monotone, but the oracle sums the
# per-step |d(v_j) - d(v_{j-1})| explicitly (lag window over the unnested
# pixel axis) rather than relying on telescoping, so a non-monotone codec
# defect still breaks the hash.
SQL_IMAGE_EDGE_ENERGY = """
WITH im AS (
  SELECT doc_id AS image_id,
         16 + (doc_id % 4) * 8 AS w, 12 + (doc_id % 3) * 6 AS h,
         doc_id % 3 AS fi,
         (doc_id * 7) % 200 AS br, (doc_id * 11) % 200 AS bg
  FROM documents
),
rvals AS (
  SELECT image_id, h, j,
         CASE WHEN fi = 2
              THEN ((br + (j * 55) // (w - 1)) // 4) * 4
                   + ((br + (j * 55) // (w - 1)) // 4) // 16
              ELSE br + (j * 55) // (w - 1) END AS v
  FROM im, (SELECT unnest(range(40)) AS j) js WHERE j < w
),
rdiff AS (
  SELECT image_id, CAST(h * SUM(ABS(v - pv)) AS BIGINT) AS eh_r
  FROM (SELECT image_id, h, v,
               lag(v) OVER (PARTITION BY image_id ORDER BY j) AS pv
        FROM rvals)
  WHERE pv IS NOT NULL GROUP BY image_id, h
),
gvals AS (
  SELECT image_id, w, r,
         CASE WHEN fi = 2
              THEN ((bg + (r * 41) // (h - 1)) // 4) * 4
                   + ((bg + (r * 41) // (h - 1)) // 4) // 16
              ELSE bg + (r * 41) // (h - 1) END AS v
  FROM im, (SELECT unnest(range(24)) AS r) rs WHERE r < h
),
gdiff AS (
  SELECT image_id, CAST(w * SUM(ABS(v - pv)) AS BIGINT) AS ev_g
  FROM (SELECT image_id, w, v,
               lag(v) OVER (PARTITION BY image_id ORDER BY r) AS pv
        FROM gvals)
  WHERE pv IS NOT NULL GROUP BY image_id, w
)
SELECT i.image_id, r.eh_r, g.ev_g, r.eh_r + g.ev_g AS edge_total
FROM im i JOIN rdiff r USING (image_id) JOIN gdiff g USING (image_id)
"""


# QJPG 6-bit dequant: q = v // 4; d(v) = q*4 + q//16  (== (q<<2)|(q>>4) since
# q>>4 < 4 occupies exactly the low 2 zero bits). fmt index 2 = jpeg.
SQL_IMAGE_DECODE_FEATURES = """
WITH """ + _SQL_IM3 + """,
rsum AS (
  -- CAST: DuckDB SUM(BIGINT) is HUGEINT, which pandas renders as float64 —
  -- the Ray side is int64, so an un-cast sum hash-mismatches on the driver
  -- even though values are numerically equal (round-3 image_decode_features
  -- red row).
  SELECT image_id,
         CAST(SUM(CASE WHEN fi = 2
                  THEN ((br + (j * 55) // (w - 1)) // 4) * 4
                       + ((br + (j * 55) // (w - 1)) // 4) // 16
                  ELSE br + (j * 55) // (w - 1) END) AS BIGINT) AS row_r
  FROM im, (SELECT unnest(range(40)) AS j) js
  WHERE j < w
  GROUP BY image_id
)
SELECT i.image_id, i.w, i.h,
       i.h * r.row_r AS sum_r,
       i.w * i.h * (CASE WHEN i.fi = 2 THEN (i.bg // 4) * 4 + (i.bg // 4) // 16
                         ELSE i.bg END) AS sum_g,
       i.w * i.h * (CASE WHEN i.fi = 2 THEN (i.bb // 4) * 4 + (i.bb // 4) // 16
                         ELSE i.bb END) AS sum_b
FROM im i JOIN rsum r USING (image_id)
"""


# gradient row sum S(w) = Σ_j (j*55)//(w-1) per fixture width (16/24/32/40)
SQL_VIDEO_FRAME_MEANS = """
WITH v AS (
  SELECT doc_id AS video_id,
         4 + doc_id % 28 AS n_frames,
         16 + (doc_id % 4) * 8 AS w,
         12 + (doc_id % 3) * 6 AS h
  FROM documents
), vf AS (
  SELECT video_id, w, h, unnest(range(0, n_frames, 3)) AS frame_idx FROM v
)
SELECT video_id, frame_idx,
       h * (w * ((video_id * 7 + frame_idx * 13) % 200)
            + CASE w WHEN 16 THEN 435 WHEN 24 THEN 649
                     WHEN 32 THEN 865 ELSE 1081 END) AS sum_r,
       w * h * ((video_id * 11 + frame_idx * 5) % 200) AS sum_g,
       w * h * ((video_id * 3 + frame_idx * 17) % 200) AS sum_b
FROM vf
"""


def q_point_dbscan(sf_dir: str):  # exact oracle (recursive-CTE components)
    """Density-based clustering (DBSCAN) over the probe points under the
    Chebyshev metric (``spatial.grid_dbscan``): cell-bucket self-join for
    eps-neighbor pairs, combiner-first degrees, core gate |N(p)| >= 4
    (counting p), core-graph connected components via the pointer-doubling
    CC engine, deterministic min-label border attachment. The density
    analog of the reference's match-equivalence grouping
    (``GtfsOsmNetworkDAO/loaders.js:39-49``) and the spatial-blocking step
    of dedup pipelines over phash/embedding keys."""
    pts = conflation.read_points(sf_dir).select_columns(
        ["point_id", "px", "py"])
    return spatial.grid_dbscan(pts, eps=32, min_pts=4,
                               est_rows=_nrows(sf_dir, "lineitem"))


SQL_POINT_DBSCAN = f"""
WITH RECURSIVE points AS ({td.POINTS_SQL}),
cells AS (
  SELECT point_id, px, py, px // 32 + 1 AS cx, py // 32 + 1 AS cy FROM points
),
off AS (SELECT * FROM (VALUES (-1), (0), (1)) t(d)),
pairs AS (
  SELECT a.point_id AS pid_a, b.point_id AS pid_b
  FROM cells a
  JOIN (SELECT c.point_id, c.px, c.py, c.cx + ox.d AS gx, c.cy + oy.d AS gy
        FROM cells c, off ox, off oy) b
    ON b.gx = a.cx AND b.gy = a.cy
  WHERE abs(a.px - b.px) <= 32 AND abs(a.py - b.py) <= 32
    AND a.point_id <> b.point_id
),
deg AS (SELECT pid_a AS pid, COUNT(*) AS deg FROM pairs GROUP BY 1),
core AS (SELECT pid FROM deg WHERE deg >= 3),
cedges AS (
  SELECT p.pid_a AS src, p.pid_b AS dst
  FROM pairs p
  JOIN core ca ON ca.pid = p.pid_a
  JOIN core cb ON cb.pid = p.pid_b
),
reach AS (
  SELECT src AS node, src AS lbl FROM cedges
  UNION
  SELECT e.dst AS node, r.lbl FROM reach r JOIN cedges e ON e.src = r.node
),
clab AS (SELECT node, MIN(lbl) AS lbl FROM reach GROUP BY node),
corelab AS (
  SELECT c.pid, COALESCE(l.lbl, c.pid) AS cluster_id
  FROM core c LEFT JOIN clab l ON l.node = c.pid
),
border AS (
  SELECT p.pid_a AS pid, MIN(cl.cluster_id) AS cluster_id
  FROM pairs p
  JOIN corelab cl ON cl.pid = p.pid_b
  LEFT JOIN core k ON k.pid = p.pid_a
  WHERE k.pid IS NULL
  GROUP BY 1
)
SELECT p.point_id,
       CASE WHEN c.pid IS NOT NULL THEN 'core'
            WHEN b.pid IS NOT NULL THEN 'border'
            ELSE 'noise' END AS role,
       CAST(COALESCE(c.cluster_id, b.cluster_id, -1) AS BIGINT) AS cluster_id
FROM points p
LEFT JOIN corelab c ON c.pid = p.point_id
LEFT JOIN border b ON b.pid = p.point_id
"""




def q_orders_ntile(sf_dir: str):  # exact oracle (NTILE window)
    """Equal-frequency bucketing: NTILE(8) of order price within each
    order priority, deterministic tie-break by order key — the quantile
    bucketing / stratification pass of a feature pipeline (the windowed
    sibling of O4's RANK toposort,
    ``/root/reference/src/daos/GtfsConflationMapJoinDAO/loaders.js:319-372``).
    Fully vectorized per bucket: one sort, group sizes by run-length, the
    NTILE index closed-form from (pos-in-group, N, n)."""
    orders = _rp(sf_dir, "orders",
                 ["o_orderkey", "o_orderpriority", "o_totalprice"])

    def _prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": batch["o_orderkey"],
            "o_orderpriority": batch["o_orderpriority"],
            "price_c": cents(batch["o_totalprice"].to_numpy(
                zero_copy_only=False)),
        })

    def _ntile(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_orderpriority", "price_c", "o_orderkey"],
                            ascending=[True, False, True], kind="mergesort")
        pr = df["o_orderpriority"].to_numpy()
        starts = np.flatnonzero(np.r_[True, pr[1:] != pr[:-1]])
        sizes = np.diff(np.r_[starts, len(df)])
        pos = np.arange(len(df)) - np.repeat(starts, sizes)
        N = np.repeat(sizes, sizes)
        q, r = N // 8, N % 8
        cut = r * (q + 1)
        tile8 = np.where(pos < cut, pos // np.maximum(q + 1, 1),
                         r + (pos - cut) // np.maximum(q, 1)) + 1
        return df.assign(tile8=tile8.astype(np.int64))

    return rel.bucketed_groups(
        orders.map_batches(_prep, batch_format="pyarrow", batch_size=32768),
        ["o_orderpriority"], _ntile,
        est_rows=_nrows(sf_dir, "orders"))


SQL_ORDERS_NTILE = """
SELECT o_orderkey, o_orderpriority, price_c,
       CAST(NTILE(8) OVER (
         PARTITION BY o_orderpriority
         ORDER BY price_c DESC, o_orderkey) AS BIGINT) AS tile8
FROM (SELECT o_orderkey, o_orderpriority,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
      FROM orders)
"""


def q_events_cms(sf_dir: str):  # exact oracle (hash arithmetic mirrored)
    """Count-Min sketch (Cormode & Muthukrishnan 2005) over the event-type
    stream: d=4 rows x w=1024 counters, row hash = FNV-1a64 of
    (chr(65+r) || type) mod w. Counters build map-side (per-batch bincount
    over the 4096-slot space — the shuffle moves sketch partials, never
    events); estimates = min over rows, reported next to the exact count so
    the one-sided overestimate property is visible in the output. Third
    sketch in the engine next to HLL (approx-distinct) and Misra-Gries
    (heavy hitters)."""
    from ..functions.text import fnv1a64_batch

    D, W = 4, 1024
    ev = _rp(sf_dir, "events", ["event_type"])

    def _partials(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        slots = []
        for r in range(D):
            h = fnv1a64_batch([chr(65 + r) + s for s in et]) % W
            slots.append(r * W + h.astype(np.int64))
        cnt = np.bincount(np.concatenate(slots), minlength=D * W)
        nz = np.flatnonzero(cnt)
        return pa.table({"slot": nz.astype(np.int64),
                         "cnt": cnt[nz].astype(np.int64)})

    counters = rel.partial_groupby_sum(
        ev.map_batches(_partials, batch_format="pyarrow", batch_size=32768),
        ["slot"], ["cnt"], n_buckets=1)
    # sketch is 4096-bounded: ship it to the (alphabet-bounded) type rows
    cdf = counters.to_pandas()
    grid = np.zeros(D * W, dtype=np.int64)
    grid[cdf["slot"].to_numpy()] = cdf["cnt"].to_numpy()
    grid_ref = ray.put(grid)

    true_counts = rel.partial_groupby_sum(
        ev, ["event_type"], [], count_as="n_true", n_buckets=1)

    def _est(batch: pa.Table) -> pa.Table:
        from ..stages.util import cached_state
        g = cached_state(grid_ref, lambda a: a, token="_cms_grid")
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        est = np.full(len(et), np.iinfo(np.int64).max, dtype=np.int64)
        for r in range(D):
            h = fnv1a64_batch([chr(65 + r) + s for s in et]) % W
            est = np.minimum(est, g[r * W + h.astype(np.int64)])
        return pa.table({"event_type": batch["event_type"],
                         "n_true": batch["n_true"],
                         "cms_est": est})

    return true_counts.map_batches(_est, batch_format="pyarrow",
                                   batch_size=8192)


SQL_EVENTS_CMS = f"""
WITH r AS (SELECT * FROM (VALUES (0), (1), (2), (3)) t(r)),
h AS (
  SELECT r.r,
         CAST({_sql_fnv("chr(65 + r.r) || event_type")} % 1024 AS BIGINT)
           AS col,
         event_type
  FROM events, r
),
cnt AS (SELECT r, col, COUNT(*) AS c FROM h GROUP BY 1, 2),
types AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_true
          FROM events GROUP BY 1),
q AS (
  SELECT t.event_type, r.r,
         CAST({_sql_fnv("chr(65 + r.r) || t.event_type")} % 1024 AS BIGINT)
           AS col
  FROM types t, r
)
SELECT t.event_type, t.n_true, CAST(MIN(c.c) AS BIGINT) AS cms_est
FROM types t
JOIN q ON q.event_type = t.event_type
JOIN cnt c ON c.r = q.r AND c.col = q.col
GROUP BY 1, 2
"""


def q_grid_idw(sf_dir: str):  # exact oracle (integer weight arithmetic)
    """Inverse-distance-weighted field interpolation at tile centroids
    (``spatial.idw_grid``): box radius 256, weight = 2^20 // (1 + d²),
    value = floor(quantity) — fused probe+bincount partials, site-sized
    shuffle."""
    pts = conflation.read_points(sf_dir)

    def _prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "px": batch["px"], "py": batch["py"],
            "v": np.floor(batch["l_quantity"].to_numpy(
                zero_copy_only=False)).astype(np.int64),
        })

    sites = td.tiles_table(sf_dir).select(["tile_id", "cx", "cy"])
    sites = sites.rename_columns(["site_id", "cx", "cy"])
    sites_ref = ray.put((sites, 256))
    out = spatial.idw_grid(
        pts.map_batches(_prep, batch_format="pyarrow", batch_size=32768),
        sites_ref, radius=256, x_col="px", y_col="py", val_col="v")
    return out.map_batches(
        lambda t: t.rename_columns(["tile_id", "n_pts", "sum_w", "sum_wv"]),
        batch_format="pyarrow", batch_size=32768)


SQL_GRID_IDW = _CTES + """,
j AS (
  SELECT t.tile_id, p.px - t.cx AS dx, p.py - t.cy AS dy,
         CAST(FLOOR(p.l_quantity) AS BIGINT) AS v
  FROM points p JOIN tiles t
    ON p.px BETWEEN t.cx - 256 AND t.cx + 256
   AND p.py BETWEEN t.cy - 256 AND t.cy + 256
)
SELECT tile_id, CAST(COUNT(*) AS BIGINT) AS n_pts,
       CAST(SUM(1048576 // (1 + dx * dx + dy * dy)) AS BIGINT) AS sum_w,
       CAST(SUM((1048576 // (1 + dx * dx + dy * dy)) * v) AS BIGINT)
         AS sum_wv
FROM j GROUP BY 1
"""


def q_tile_bfs_hops(sf_dir: str):  # exact oracle (bounded recursive CTE)
    """Multi-source BFS over the (undirected) tile kNN graph: hop distance
    ≤ 4 from the seed tiles (tile_id % 50 == 0) — ``graphrank.bfs_hops``,
    one frontier join + grouped-min dedup per round."""
    from ..stages.graphrank import bfs_hops

    knn = q_tile_knn_graph(sf_dir)

    def _edges(t: pa.Table) -> pa.Table:
        s = t["src_tile"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["tile_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = s != d
        s, d = s[m], d[m]
        return pa.table({"src": np.concatenate([s, d]),
                         "dst": np.concatenate([d, s])})

    edges = knn.map_batches(_edges, batch_format="pyarrow",
                            batch_size=65536).materialize()
    part = _rp(sf_dir, "part", ["p_partkey", "p_size"])

    def _seeds(batch: pa.Table) -> pa.Table:
        t = td.tiles_batch(batch)
        tid = t["tile_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": tid[tid % 50 == 0]})

    seeds = part.map_batches(_seeds, batch_format="pyarrow",
                             batch_size=65536)
    out = bfs_hops(edges, seeds, max_hops=4)
    return out.map_batches(
        lambda t: t.rename_columns(["tile_id", "hops"]),
        batch_format="pyarrow", batch_size=65536)


SQL_TILE_BFS_HOPS = f"""
WITH RECURSIVE tiles AS ({td.TILES_SQL}),
probes AS (SELECT tile_id AS src_tile, cx AS px, cy AS py
           FROM tiles WHERE tile_id % 10 = 0),
knn AS (
  SELECT src_tile, tile_id FROM (
    SELECT p.src_tile, t.tile_id,
           ROW_NUMBER() OVER (
             PARTITION BY p.src_tile
             ORDER BY (p.px - t.cx) * (p.px - t.cx)
                    + (p.py - t.cy) * (p.py - t.cy), t.tile_id) AS knn_rank
    FROM probes p CROSS JOIN tiles t
  ) WHERE knn_rank <= 4
),
ed AS (
  SELECT src_tile AS s, tile_id AS t FROM knn WHERE tile_id <> src_tile
  UNION
  SELECT tile_id, src_tile FROM knn WHERE tile_id <> src_tile
),
seeds AS (SELECT tile_id AS node FROM tiles WHERE tile_id % 50 = 0),
reach AS (
  SELECT node, 0 AS d FROM seeds
  UNION
  SELECT e.t, r.d + 1 FROM reach r JOIN ed e ON e.s = r.node WHERE r.d < 4
)
SELECT node AS tile_id, CAST(MIN(d) AS BIGINT) AS hops
FROM reach GROUP BY 1
"""


def q_supplier_kcore(sf_dir: str):  # exact oracle (unrolled peel rounds)
    """k-core backbone of the supplier co-occurrence graph
    (``graphrank.kcore_peel``, k=4, 6 peel rounds — fixed-round convention
    shared with ``pagerank`` so the oracle unrolls exactly): survivors with
    their degree in the final induced subgraph."""
    from ..stages.graphrank import kcore_peel

    out = kcore_peel(q_supplier_cooccurrence(sf_dir), k=4, rounds=6)
    return out.map_batches(
        lambda t: t.rename_columns(["supp", "deg"]),
        batch_format="pyarrow", batch_size=65536)


def _sql_kcore_rounds(rounds: int, k: int) -> str:
    # MATERIALIZED is load-bearing: each ed{r+1} references ed{r} three
    # times (directly + twice through n{r+1}), so DuckDB's default CTE
    # inlining would expand the chain 3^rounds-fold — the wedge self-join
    # inside `e` replayed 729× spills hundreds of GB of temp at sf0.1.
    parts = ["ed0 AS MATERIALIZED (SELECT supp_a AS s, supp_b AS t FROM e "
             "UNION ALL SELECT supp_b, supp_a FROM e)"]
    for r in range(rounds):
        parts.append(
            f"n{r + 1} AS MATERIALIZED (SELECT s FROM ed{r} GROUP BY s "
            f"HAVING COUNT(*) >= {k})")
        parts.append(
            f"ed{r + 1} AS MATERIALIZED (SELECT ed{r}.s, ed{r}.t FROM ed{r} "
            f"JOIN n{r + 1} a ON a.s = ed{r}.s "
            f"JOIN n{r + 1} b ON b.s = ed{r}.t)")
    return ",\n".join(parts)


SQL_SUPPLIER_KCORE = ("WITH " + _SQL_COOC_EDGES + ",\n"
                      + _sql_kcore_rounds(6, 4) + """
SELECT s AS supp, CAST(COUNT(*) AS BIGINT) AS deg
FROM ed6 GROUP BY s
""")


def q_image_block_stats(sf_dir: str):  # exact oracle (separable fixture)
    """Per-block integer mean colors (``media.ImageBlockStats``): each
    decoded image is tiled into 4x6 blocks and every block emits
    ``floor(channel block sum / 24)`` as ROWS — the exact-arithmetic area
    downsample behind thumbnailing / patch-embedding inputs (reference
    emits raster tiles the same way in its mbtiles path). Reuses the
    ``image_edge_energy`` fixture (R varies along x, G along y, B constant;
    ``w % 4 == 0`` and ``h % 6 == 0`` by construction), so the engine's
    genuine 2D reshape-block-sum is mirrored by a SEPARABLE oracle:
    ``mean_r`` depends only on the block column (sum of 4 dequantized
    j-values // 4), ``mean_g`` only on the block row, ``mean_b`` is the
    dequantized constant."""
    docs = _rp(sf_dir, "documents", ["doc_id"])

    synth = docs.map_batches(_image_fixture_synth, batch_format="pyarrow", batch_size=512)
    return mstage.image_block_stats(synth, bw=4, bh=6, batch_size=512)


SQL_IMAGE_BLOCK_STATS = """
WITH """ + _SQL_IM3 + """,
rb AS (
  SELECT image_id, j // 4 AS bx,
         CAST(SUM(CASE WHEN fi = 2
              THEN ((br + (j * 55) // (w - 1)) // 4) * 4
                   + ((br + (j * 55) // (w - 1)) // 4) // 16
              ELSE br + (j * 55) // (w - 1) END) // 4 AS BIGINT) AS mean_r
  FROM im, (SELECT unnest(range(40)) AS j) js WHERE j < w
  GROUP BY image_id, j // 4
),
gb AS (
  SELECT image_id, r // 6 AS "by",
         CAST(SUM(CASE WHEN fi = 2
              THEN ((bg + (r * 41) // (h - 1)) // 4) * 4
                   + ((bg + (r * 41) // (h - 1)) // 4) // 16
              ELSE bg + (r * 41) // (h - 1) END) // 6 AS BIGINT) AS mean_g
  FROM im, (SELECT unnest(range(24)) AS r) rs WHERE r < h
  GROUP BY image_id, r // 6
),
bc AS (
  SELECT image_id,
         CAST(CASE WHEN fi = 2 THEN (bb // 4) * 4 + (bb // 4) // 16
              ELSE bb END AS BIGINT) AS mean_b
  FROM im
)
SELECT r.image_id, r.bx, g."by", r.mean_r, g.mean_g, b.mean_b
FROM rb r
JOIN gb g ON g.image_id = r.image_id
JOIN bc b ON b.image_id = r.image_id
"""


def q_stay_points(sf_dir: str):  # exact oracle (window + gaps-and-islands)
    """Trajectory dwell detection (``spatial.stay_point_islands``): a point
    is a STAY CORE iff the next 4 points of its trajectory all lie within
    Chebyshev radius 16 (full window required); maximal consecutive-core
    runs merge into dwell islands (traj_id, start_seq, end_seq, n_core).
    The synthetic traces interleave dwell blocks (jitter <= 12 < r) with
    1000-unit jumps between blocks, plus a +40 x-spike every 23rd seq —
    the spike defeats any implementation that skips the per-axis window
    max — so the radius gate, the full-window rule AND the island merge
    all carry signal. Oracle: MAX/MIN OVER (ROWS BETWEEN CURRENT ROW AND
    4 FOLLOWING) + the seq-minus-row_number islands trick."""
    ev = _rp(sf_dir, "events", ["event_id"])
    nk = 50

    def _synth(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        traj = eid % nk
        seq = eid // nk
        blk = seq // (8 + traj % 5)
        spike = np.where((seq * 7919) % 23 == 0, 40, 0)
        x = traj * 100000 + blk * 1000 + (seq * 2654435761) % 13 + spike
        y = blk * 1000 + (seq * 40503) % 11
        return pa.table({"traj_id": traj, "seq": seq,
                         "x": x.astype(np.int64), "y": y.astype(np.int64)})

    pts = ev.map_batches(_synth, batch_format="pyarrow", batch_size=8192)
    return spatial.stay_point_islands(pts, "traj_id", "seq", "x", "y",
                                      k=4, r=16)


SQL_STAY_POINTS = """
WITH xy AS (
  SELECT event_id % 50 AS traj_id, event_id // 50 AS seq,
         (event_id % 50) * 100000
           + ((event_id // 50) // (8 + (event_id % 50) % 5)) * 1000
           + ((event_id // 50) * 2654435761) % 13
           + CASE WHEN ((event_id // 50) * 7919) % 23 = 0
                  THEN 40 ELSE 0 END AS x,
         ((event_id // 50) // (8 + (event_id % 50) % 5)) * 1000
           + ((event_id // 50) * 40503) % 11 AS y
  FROM events
),
win AS (
  SELECT traj_id, seq, x, y,
         MAX(x) OVER w AS mxx, MIN(x) OVER w AS mnx,
         MAX(y) OVER w AS mxy, MIN(y) OVER w AS mny,
         COUNT(*) OVER w AS cnt
  FROM xy
  WINDOW w AS (PARTITION BY traj_id ORDER BY seq
               ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING)
),
cores AS (
  SELECT traj_id, seq FROM win
  WHERE cnt = 5 AND mxx - x <= 16 AND x - mnx <= 16
        AND mxy - y <= 16 AND y - mny <= 16
),
isl AS (
  SELECT traj_id, seq,
         seq - ROW_NUMBER() OVER (PARTITION BY traj_id ORDER BY seq) AS grp
  FROM cores
)
SELECT traj_id, CAST(MIN(seq) AS BIGINT) AS start_seq,
       CAST(MAX(seq) AS BIGINT) AS end_seq,
       CAST(COUNT(*) AS BIGINT) AS n_core
FROM isl GROUP BY traj_id, grp
"""


def q_doc_pack_sequences(sf_dir: str):  # exact oracle (prefix-sum window)
    """LLM training SEQUENCE PACKING (``textops.pack_sequences``): docs in
    doc_id order laid end-to-end on the global token axis, cut into
    128-token sequences, docs split across cuts — one row per
    (doc x sequence) overlap with the in-sequence offset. seq_len=128 makes
    splits common at every scale; chunk=256 forces the multi-chunk
    broadcast-offset path even at sf0.001. Oracle: running-SUM window for
    the exclusive prefix, range() unnest for the ragged expansion."""
    return textops.pack_sequences(
        _rp(sf_dir, "documents", ["doc_id", "text"]), seq_len=128, chunk=256)


SQL_DOC_PACK_SEQUENCES = r"""
WITH tok AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(text, '\s+'),
                         x -> x <> '')) AS n
  FROM documents
),
pre AS (
  SELECT doc_id, n,
         CAST(SUM(n) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - n AS BIGINT) AS s
  FROM tok
),
ex AS (
  SELECT doc_id, n, s,
         unnest(range(s // 128, (s + n - 1) // 128 + 1)) AS seq_id
  FROM pre WHERE n > 0
)
SELECT doc_id, CAST(seq_id AS BIGINT) AS seq_id,
       CAST(GREATEST(s, seq_id * 128) - seq_id * 128 AS BIGINT) AS tok_start,
       CAST(LEAST(s + n, (seq_id + 1) * 128)
            - GREATEST(s, seq_id * 128) AS BIGINT) AS n_toks
FROM ex
"""


def q_image_histogram(sf_dir: str):  # exact oracle (separable fixture)
    """Per-channel 8-bin intensity histograms (``media.ImageHistogram``)
    through the decode path, zero bins omitted — the exposure/contrast
    quality filter. Same gradient fixture as ``image_edge_energy``; the
    separable oracle counts bin hits along the varying axis and multiplies
    by the constant axis length (dequant applied inside the bin map for
    the jpeg third of the images)."""
    docs = _rp(sf_dir, "documents", ["doc_id"])

    synth = docs.map_batches(_image_fixture_synth, batch_format="pyarrow", batch_size=512)
    return mstage.image_histogram(synth, batch_size=512)


SQL_IMAGE_HISTOGRAM = """
WITH """ + _SQL_IM3 + """,
rh AS (
  SELECT image_id, 0 AS channel, v // 32 AS bin,
         CAST(MIN(h) * COUNT(*) AS BIGINT) AS n
  FROM (SELECT image_id, h,
               CASE WHEN fi = 2
                    THEN ((br + (j * 55) // (w - 1)) // 4) * 4
                         + ((br + (j * 55) // (w - 1)) // 4) // 16
                    ELSE br + (j * 55) // (w - 1) END AS v
        FROM im, (SELECT unnest(range(40)) AS j) js WHERE j < w)
  GROUP BY image_id, v // 32
),
gh AS (
  SELECT image_id, 1 AS channel, v // 32 AS bin,
         CAST(MIN(w) * COUNT(*) AS BIGINT) AS n
  FROM (SELECT image_id, w,
               CASE WHEN fi = 2
                    THEN ((bg + (r * 41) // (h - 1)) // 4) * 4
                         + ((bg + (r * 41) // (h - 1)) // 4) // 16
                    ELSE bg + (r * 41) // (h - 1) END AS v
        FROM im, (SELECT unnest(range(24)) AS r) rs WHERE r < h)
  GROUP BY image_id, v // 32
),
bh AS (
  SELECT image_id, 2 AS channel,
         (CASE WHEN fi = 2 THEN (bb // 4) * 4 + (bb // 4) // 16
               ELSE bb END) // 32 AS bin,
         CAST(w * h AS BIGINT) AS n
  FROM im
)
SELECT image_id, CAST(channel AS BIGINT) AS channel,
       CAST(bin AS BIGINT) AS bin, n
FROM (SELECT * FROM rh UNION ALL SELECT * FROM gh UNION ALL
      SELECT * FROM bh)
"""


def q_traj_step_stats(sf_dir: str):  # exact oracle (lag window)
    """Per-trajectory Chebyshev step statistics (``spatial.
    traj_step_stats``) over the stay-point traces: n_pts, path length,
    max step, jump count (> 64 — block transitions only, since dwell
    jitter + the x-spike stays under 64 by construction)."""
    ev = _rp(sf_dir, "events", ["event_id"])
    nk = 50

    def _synth(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        traj = eid % nk
        seq = eid // nk
        blk = seq // (8 + traj % 5)
        spike = np.where((seq * 7919) % 23 == 0, 40, 0)
        x = traj * 100000 + blk * 1000 + (seq * 2654435761) % 13 + spike
        y = blk * 1000 + (seq * 40503) % 11
        return pa.table({"traj_id": traj, "seq": seq,
                         "x": x.astype(np.int64), "y": y.astype(np.int64)})

    pts = ev.map_batches(_synth, batch_format="pyarrow", batch_size=8192)
    return spatial.traj_step_stats(pts, "traj_id", "seq", "x", "y", jump=64)


SQL_TRAJ_STEP_STATS = """
WITH xy AS (
  SELECT event_id % 50 AS traj_id, event_id // 50 AS seq,
         (event_id % 50) * 100000
           + ((event_id // 50) // (8 + (event_id % 50) % 5)) * 1000
           + ((event_id // 50) * 2654435761) % 13
           + CASE WHEN ((event_id // 50) * 7919) % 23 = 0
                  THEN 40 ELSE 0 END AS x,
         ((event_id // 50) // (8 + (event_id % 50) % 5)) * 1000
           + ((event_id // 50) * 40503) % 11 AS y
  FROM events
),
st AS (
  SELECT traj_id,
         GREATEST(ABS(x - lag(x) OVER w), ABS(y - lag(y) OVER w)) AS step
  FROM xy
  WINDOW w AS (PARTITION BY traj_id ORDER BY seq)
)
SELECT traj_id, CAST(COUNT(*) AS BIGINT) AS n_pts,
       CAST(COALESCE(SUM(step), 0) AS BIGINT) AS path_len,
       CAST(COALESCE(MAX(step), 0) AS BIGINT) AS max_step,
       CAST(COALESCE(SUM(CASE WHEN step > 64 THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_jumps
FROM st GROUP BY traj_id
"""


def q_audio_vad_segments(sf_dir: str):  # exact oracle (islands over frames)
    """Voice-activity segmentation (``media.AudioVAD``) through the real
    WAV decode path: square-wave clips alternate LOUD (3 frames) and QUIET
    (6 frames) regions in 240-sample blocks; frame (80 samples) L1 energy
    gates activity at 120000 and maximal active runs become segments. The
    sign carrier (half-period 2+i%14) is irrelevant to |s| by design — a
    decode defect that corrupts amplitudes or sample counts breaks the
    hash. Oracle: frame-level closed form of the synthesis + the
    gaps-and-islands trick; per-frame uniformity holds because the 240
    block is exactly 3 frames."""
    docs = _rp(sf_dir, "documents", ["doc_id"])

    def _synth(batch: pa.Table) -> pa.Table:
        from ..functions import media as M

        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = []
        for i in ids:
            n = 1000 + (i * 101) % 4000
            hi = 2000 + (i * 53) % 1000
            lo = 50 + i % 20
            p = 2 + i % 14
            t = np.arange(n, dtype=np.int64)
            amp = np.where((t // 240) % 3 == 0, hi, lo)
            s = (np.where((t // p) % 2 == 0, amp, -amp)).astype(np.int16)
            blobs.append(M.encode_wav(s, 8000))
        return pa.table({
            "audio_id": ids,
            "bytes": pa.array(blobs, type=pa.binary()),
            "fmt": pa.array(["wav"] * len(ids), type=pa.string()),
        })

    synth = docs.map_batches(_synth, batch_format="pyarrow", batch_size=512)
    return mstage.audio_vad_segments(synth, frame=80, thr=120000,
                                     batch_size=512)


SQL_AUDIO_VAD_SEGMENTS = """
WITH au AS (
  SELECT doc_id AS audio_id,
         (1000 + (doc_id * 101) % 4000) // 80 AS nf,
         2000 + (doc_id * 53) % 1000 AS hi,
         50 + doc_id % 20 AS lo
  FROM documents
),
fr AS (
  SELECT audio_id, hi, lo, unnest(range(nf)) AS f FROM au
),
act AS (
  SELECT audio_id, f,
         80 * (CASE WHEN (f // 3) % 3 = 0 THEN hi ELSE lo END) AS e
  FROM fr
  WHERE 80 * (CASE WHEN (f // 3) % 3 = 0 THEN hi ELSE lo END) > 120000
),
isl AS (
  SELECT audio_id, f, e,
         f - ROW_NUMBER() OVER (PARTITION BY audio_id ORDER BY f) AS grp
  FROM act
)
SELECT audio_id, CAST(MIN(f) AS BIGINT) AS start_frame,
       CAST(MAX(f) AS BIGINT) AS end_frame,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(MAX(e) AS BIGINT) AS max_energy
FROM isl GROUP BY audio_id, grp
"""


def q_video_shot_segments(sf_dir: str):  # exact oracle (diff + islands)
    """Shot-boundary segmentation: QVID clips with 7-frame SCENES — G and B
    base colors jump by an alternating 120/110 offset at every scene cut,
    within-scene drift is a gentle 5/2/3 per-channel ramp (no mod wraps by
    construction) — sampled at every_n=1 by the real ``FrameSampler``
    (header + seek-index decode), then ``media.shot_segments`` cuts where
    the per-pixel L1 channel-sum diff exceeds 150. The gradient on R is
    constant across frames so it cancels in diffs — the oracle mirrors
    base-color deltas only, while the engine measures genuine decoded
    sums normalized by the sampler's genuine w*h."""
    docs = _rp(sf_dir, "documents", ["doc_id"])

    def _synth(batch: pa.Table) -> pa.Table:
        from ..functions import media as M

        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = []
        for i in ids:
            nf, w, h = int(4 + i % 28), int(16 + (i % 4) * 8), int(12 + (i % 3) * 6)
            grad = ((np.arange(w, dtype=np.int64) * 55) // (w - 1)).astype(np.uint8)
            frames = np.empty((nf, h, w, 3), dtype=np.uint8)
            for f in range(nf):
                frames[f, :, :, 0] = np.uint8(
                    60 + (i * 7) % 80 + (f % 7) * 5) + grad[None, :]
                frames[f, :, :, 1] = (50 + (i * 11) % 40 + (f % 7) * 2
                                      + ((f // 7) % 2) * 120)
                frames[f, :, :, 2] = (30 + (i * 3) % 50 + (f % 7) * 3
                                      + ((f // 7) % 2) * 110)
            blobs.append(M.encode_video(frames, fps=24))
        return pa.table(
            {"video_id": ids, "bytes": pa.array(blobs, type=pa.binary())})

    synth = docs.map_batches(_synth, batch_format="pyarrow", batch_size=256)
    frames = mstage.sample_frames(synth, every_n=1, with_ahash=False,
                                  batch_size=256)
    return mstage.shot_segments(frames, thr_px=150)


# within-scene per-pixel diff = 5+2+3 = 10 << 150; at a cut (f%7==0, f>0)
# the R ramp resets (-30), G jumps -12±120, B jumps -18±110 → diff ≥ 230.
# grad(R) is frame-constant: cancels. Max pixel values stay < 256 (no mod
# wrap anywhere), so the per-channel deltas below are the exact decoded
# sums divided by w*h.
SQL_VIDEO_SHOT_SEGMENTS = """
WITH vid AS (
  SELECT doc_id AS video_id, doc_id AS i, 4 + doc_id % 28 AS nf
  FROM documents
),
fr AS (SELECT video_id, i, unnest(range(nf)) AS f FROM vid),
df AS (
  SELECT video_id, f,
         CASE WHEN f = 0 THEN 0 ELSE
              ABS(((f % 7) - ((f - 1) % 7)) * 5)
            + ABS(((f % 7) - ((f - 1) % 7)) * 2
                  + (((f // 7) % 2) - (((f - 1) // 7) % 2)) * 120)
            + ABS(((f % 7) - ((f - 1) % 7)) * 3
                  + (((f // 7) % 2) - (((f - 1) // 7) % 2)) * 110)
         END AS d
  FROM fr
),
sh AS (
  SELECT video_id, f,
         SUM(CASE WHEN f > 0 AND d > 150 THEN 1 ELSE 0 END)
           OVER (PARTITION BY video_id ORDER BY f) AS shot_id
  FROM df
)
SELECT video_id, CAST(shot_id AS BIGINT) AS shot_id,
       CAST(MIN(f) AS BIGINT) AS start_frame,
       CAST(MAX(f) AS BIGINT) AS end_frame,
       CAST(COUNT(*) AS BIGINT) AS n_frames
FROM sh GROUP BY video_id, shot_id
"""


def q_doc_decontaminate(sf_dir: str):  # exact oracle (string equality)
    """Benchmark decontamination (``textops.decontaminate``): per training
    doc, the count of its word 5-grams that appear anywhere in the
    benchmark set (docs with doc_id % 97 == 0 stand in for the held-out
    suite; the rest are the training side). String-equality matching —
    no hash-collision caveat on either side."""
    docs = _rp(sf_dir, "documents", ["doc_id", "text"])

    def _is_bench(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % 97 == 0))

    def _is_train(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % 97 != 0))

    bench = docs.map_batches(_is_bench, batch_format="pyarrow",
                             batch_size=2048)
    train = docs.map_batches(_is_train, batch_format="pyarrow",
                             batch_size=2048)
    return textops.decontaminate(train, bench, n=5)


SQL_DOC_DECONTAMINATE = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
),
ng AS (
  SELECT doc_id, array_to_string(list_slice(t, p + 1, p + 5), ' ') AS g
  FROM (SELECT doc_id, t, unnest(range(len(t) - 4)) AS p
        FROM toks WHERE len(t) >= 5)
),
bench AS (SELECT DISTINCT g FROM ng WHERE doc_id % 97 = 0),
probe AS (SELECT doc_id, g FROM ng WHERE doc_id % 97 <> 0)
SELECT p.doc_id, CAST(COUNT(*) AS BIGINT) AS n_ngrams,
       CAST(SUM(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_contaminated
FROM probe p LEFT JOIN bench b ON p.g = b.g
GROUP BY p.doc_id
"""


def q_ann_recall(sf_dir: str):  # exact oracle (composed CTE chains)
    """ANN index EVALUATION — recall@5 of the IVF index against the exact
    brute-force ground truth, per query: the measurement loop that decides
    nprobe/codebook sizing before an index ships. Both sides are the
    existing oracle-green operators (``ann.cosine_topk``,
    ``ann.ivf_topk``); the comparison set is k x Q rows by construction
    (40 here), so the driver-side merge is bounded and documented."""
    emb = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    qtab = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"],
                         filters=[("vec_id", "<", 8)])
    qtab = pa.table({"query_id": qtab["vec_id"], "embedding": qtab["embedding"]})
    qref = ray.put(qtab)
    emb2 = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])  # second scan
    brute = ann.cosine_topk(emb, qref, k=5).to_pandas()   # k*Q rows
    ivf = ann.ivf_topk(emb2, qref, k=5).to_pandas()       # k*Q rows
    hit = brute.merge(ivf[["query_id", "vec_id"]], on=["query_id", "vec_id"],
                      how="left", indicator=True)
    out = (hit.groupby("query_id")
              .agg(n_hit=("_merge", lambda s: int((s == "both").sum())))
              .reset_index())
    out["n_hit"] = out["n_hit"].astype(np.int64)
    out["k"] = np.int64(5)
    return out[["query_id", "n_hit", "k"]]


SQL_ANN_RECALL = f"""
SELECT b.query_id, CAST(COUNT(i.vec_id) AS BIGINT) AS n_hit,
       CAST(5 AS BIGINT) AS k
FROM ({SQL_ANN_TOPK}) b
LEFT JOIN ({SQL_ANN_IVF}) i
  ON i.query_id = b.query_id AND i.vec_id = b.vec_id
GROUP BY b.query_id
"""


def q_grid_moran(sf_dir: str):  # exact oracle (shift self-join)
    """Spatial autocorrelation components (``spatial.grid_moran``) over the
    probe-point density raster: per cx-band, the int64 pieces of Moran's I
    (cell count / Σv / Σv² and 8-neighborhood pair count / Σ v_i·v_j).
    Every exchange after the map-side collapse is grid-sized (≤64×64)."""
    pts = conflation.read_points(sf_dir)
    return spatial.grid_moran(pts, "px", "py", cell=1024, band_div=16)


SQL_GRID_MORAN = _CTES + """,
cells AS (
  SELECT px // 1024 AS cx, py // 1024 AS cy, COUNT(*) AS v
  FROM points GROUP BY 1, 2
),
pr AS (
  SELECT a.cx // 16 AS band, a.v * b.v AS cross_v
  FROM cells a JOIN cells b
    ON (b.cx = a.cx + 1 AND b.cy = a.cy)
    OR (b.cx = a.cx + 1 AND b.cy = a.cy + 1)
    OR (b.cx = a.cx     AND b.cy = a.cy + 1)
    OR (b.cx = a.cx - 1 AND b.cy = a.cy + 1)
),
ca AS (
  SELECT cx // 16 AS band, CAST(COUNT(*) AS BIGINT) AS n_cells,
         CAST(SUM(v) AS BIGINT) AS sum_v,
         CAST(SUM(v * v) AS BIGINT) AS sum_v2
  FROM cells GROUP BY 1
),
pa2 AS (
  SELECT band, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(cross_v) AS BIGINT) AS sum_cross
  FROM pr GROUP BY band
)
SELECT c.band, c.n_cells, c.sum_v, c.sum_v2,
       CAST(COALESCE(p.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(COALESCE(p.sum_cross, 0) AS BIGINT) AS sum_cross
FROM ca c LEFT JOIN pa2 p USING (band)
"""


def q_image_roundtrip_psnr(sf_dir: str):  # exact oracle (quantizer closed form)
    """The engine's per-row IMAGE INVARIANT as data (BASELINE.json: decoded
    pixels allclose with PSNR >= 40 dB for lossy formats + caption equality):
    each synthesized image is stored in its wire format (real BMP/PNG, QJPG
    stub) NEXT TO a lossless PNG reference; the actor-pool
    ``ImageRoundtripChecker`` decodes both and emits the exact integer error
    (SSE, max |diff|) plus the 40 dB bar as a pure-integer predicate
    (sse * 10^4 <= 255^2 * n_subpixels) and the caption-equality bit. The
    oracle mirrors the QJPG 6-bit quantizer closed-form (dq(v) = 4*(v//4) +
    (v//4)//16), so a codec regression in any format breaks the hash."""
    from ..functions import codecs

    docs = _rp(sf_dir, "documents", ["doc_id"])
    fmts3 = ["bmp", "png", "jpeg"]

    def _synth(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs, refs, fmts, caps = [], [], [], []
        for i in ids:
            w, h = int(16 + (i % 4) * 8), int(12 + (i % 3) * 6)
            grad = ((np.arange(w, dtype=np.int64) * 55) // (w - 1)).astype(np.uint8)
            img = np.empty((h, w, 3), dtype=np.uint8)
            img[:, :, 0] = np.uint8((i * 7) % 200) + grad[None, :]
            img[:, :, 1] = (i * 11) % 200
            img[:, :, 2] = (i * 3) % 200
            fmt = fmts3[int(i % 3)]
            blobs.append(codecs.encode(img, fmt))
            refs.append(codecs.encode(img, "png"))
            fmts.append(fmt)
            caps.append(f"cap-{i}")
        return pa.table(
            {
                "image_id": ids,
                "bytes": pa.array(blobs, type=pa.binary()),
                "ref_bytes": pa.array(refs, type=pa.binary()),
                "fmt": pa.array(fmts, type=pa.string()),
                "caption": pa.array(caps, type=pa.string()),
            }
        )

    synth = docs.map_batches(_synth, batch_format="pyarrow", batch_size=512)
    return mstage.image_roundtrip_check(synth, cap_col="caption",
                                        batch_size=512)


# dq(v) = 4*(v//4) + (v//4)//16 — the QJPG decode of the 6-bit quantized v;
# lossless rows (fi < 2) are zero-error by construction.
SQL_IMAGE_ROUNDTRIP_PSNR = """
WITH """ + _SQL_IM3 + """,
im2 AS (
  SELECT *,
         bg - ((bg // 4) * 4 + (bg // 4) // 16) AS eg,
         bb - ((bb // 4) * 4 + (bb // 4) // 16) AS eb
  FROM im
),
rerr AS (
  SELECT image_id, SUM(e * e) AS row_sse_r, MAX(ABS(e)) AS max_r
  FROM (
    SELECT image_id,
           (br + (j * 55) // (w - 1))
             - (((br + (j * 55) // (w - 1)) // 4) * 4
                + ((br + (j * 55) // (w - 1)) // 4) // 16) AS e
    FROM im, (SELECT unnest(range(40)) AS j) js
    WHERE j < w AND fi = 2
  ) GROUP BY image_id
),
err AS (
  SELECT i.image_id, i.w, i.h,
         CASE WHEN i.fi = 2
              THEN i.h * COALESCE(r.row_sse_r, 0)
                   + i.w * i.h * (i.eg * i.eg + i.eb * i.eb)
              ELSE 0 END AS sse,
         CASE WHEN i.fi = 2
              THEN GREATEST(COALESCE(r.max_r, 0), ABS(i.eg), ABS(i.eb))
              ELSE 0 END AS max_err
  FROM im2 i LEFT JOIN rerr r USING (image_id)
)
SELECT image_id, CAST(sse AS BIGINT) AS sse,
       CAST(max_err AS BIGINT) AS max_err,
       sse * 10000 <= 65025 * (w * h * 3) AS ok_40db,
       TRUE AS cap_ok
FROM err
"""


def q_embedding_knn_classify(sf_dir: str):  # exact oracle (kNN CTE + vote)
    """kNN CLASSIFICATION by neighbor-label majority vote — the eval loop of
    every embedding-space labeler: exact cosine top-5 per query (the
    oracle-green ``ann.cosine_topk`` kernel, query matrix broadcast once),
    labels attached map-side from a broadcast (vec_id -> label) array (the
    label side is dimension-sized, never shuffled), then a deterministic
    vote (max count, min label tie-break). The vote table is k x Q rows by
    construction (160 here), so the driver-side finish is bounded."""
    from ..stages.util import cached_state

    emb = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    qtab = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"],
                         filters=[("vec_id", "<", 32)])
    qtab = pa.table({"query_id": qtab["vec_id"], "embedding": qtab["embedding"]})
    knn = ann.cosine_topk(emb, ray.put(qtab), k=5)

    lab = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "label"])
    lab_ref = ray.put(lab)

    def _labels_state(t: pa.Table):
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lbl = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        return ids[order], lbl[order]

    def _attach(batch: pa.Table) -> pa.Table:
        ids, lbl = cached_state(lab_ref, _labels_state, token="knn_labels")
        v = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"query_id": batch["query_id"],
                         "label": lbl[np.searchsorted(ids, v)]})

    pairs = knn.map_batches(_attach, batch_format="pyarrow").to_pandas()
    vote = (pairs.groupby(["query_id", "label"]).size()
                 .reset_index(name="n_votes"))
    vote = vote.sort_values(["query_id", "n_votes", "label"],
                            ascending=[True, False, True], kind="mergesort")
    out = vote.groupby("query_id", sort=True).head(1).reset_index(drop=True)
    out = out.rename(columns={"label": "pred_label"})
    out["pred_label"] = out["pred_label"].astype(np.int64)
    out["n_votes"] = out["n_votes"].astype(np.int64)
    return out[["query_id", "pred_label", "n_votes"]]


SQL_EMBEDDING_KNN_CLASSIFY = """
WITH q AS (SELECT vec_id AS query_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
           FROM embeddings WHERE vec_id < 32),
sims AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.qe,
             list_transform(e.embedding, x -> CAST(x AS DOUBLE))) AS sim
  FROM q CROSS JOIN embeddings e
  WHERE e.vec_id <> q.query_id
),
knn AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, vec_id) AS rn
    FROM sims) WHERE rn <= 5
),
votes AS (
  SELECT k.query_id, CAST(e.label AS BIGINT) AS pred_label,
         CAST(COUNT(*) AS BIGINT) AS n_votes
  FROM knn k JOIN embeddings e ON e.vec_id = k.vec_id
  GROUP BY 1, 2
)
SELECT query_id, pred_label, n_votes
FROM (SELECT query_id, pred_label, n_votes,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY n_votes DESC, pred_label) AS rn
      FROM votes) WHERE rn = 1
"""


def q_quadkey_rollup(sf_dir: str):  # exact oracle (digit arithmetic + substr)
    """Tile-PYRAMID point counts (``spatial.quadkey_rollup``): Bing quadkey
    strings at zoom 6 over the probe points, rolled up to every zoom in
    [3, 6] via the quadkey's parent-is-prefix property — one data-sized
    map-side collapse, then grid-sized fan-out + groupby for ALL levels."""
    pts = conflation.read_points(sf_dir)
    return spatial.quadkey_rollup(pts, "px", "py", cell=1024, zoom=6,
                                  min_zoom=3)


SQL_QUADKEY_ROLLUP = _CTES + """,
cells AS (
  SELECT px // 1024 AS cx, py // 1024 AS cy, COUNT(*) AS v
  FROM points GROUP BY 1, 2
),
leaf AS (
  SELECT array_to_string(
           [CAST(((cx >> (6 - l)) & 1) + 2 * ((cy >> (6 - l)) & 1) AS VARCHAR)
            FOR l IN range(1, 7)], '') AS qk,
         v
  FROM cells
),
fan AS (
  SELECT CAST(z AS BIGINT) AS zoom, substr(qk, 1, CAST(z AS INT)) AS quadkey, v
  FROM leaf, (SELECT unnest(range(3, 7)) AS z) zs
)
SELECT zoom, quadkey, CAST(SUM(v) AS BIGINT) AS n_points
FROM fan GROUP BY zoom, quadkey
"""


def q_events_anomaly(sf_dir: str):  # exact oracle (integer z-score predicate)
    """Per-user OUTLIER detection with the 3-sigma rule as a pure-integer
    predicate: an event is anomalous iff (n*v - S)^2 > 9*(n*Q - S^2) — the
    cross-multiplied form of (v - mean)^2 > 9*var, exact in int64 cents
    (values <= 56021c, n <= 99 per user keeps every product < 2^45). One
    user-bucketed shuffle computes per-user moments and flags in the same
    pass; output is user-sized."""
    ev = _rp(sf_dir, "events", ["user_id", "value"])

    def _cents(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "v": cents(batch["value"].to_numpy(zero_copy_only=False)),
        })

    ec = ev.map_batches(_cents, batch_format="pyarrow", batch_size=8192)

    def _scan(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", sort=True)["v"]
        st = g.agg(n="size", s="sum",
                   q=lambda x: int((x.to_numpy(np.int64) ** 2).sum()))
        m = df.merge(st, left_on="user_id", right_index=True)
        n = m["n"].to_numpy(np.int64)
        s = m["s"].to_numpy(np.int64)
        q = m["q"].to_numpy(np.int64)
        v = m["v"].to_numpy(np.int64)
        flag = (n * v - s) ** 2 > 9 * (n * q - s * s)
        out = pd.DataFrame({"user_id": m["user_id"].to_numpy(np.int64),
                            "flag": flag.astype(np.int64)})
        res = out.groupby("user_id", sort=True)["flag"].agg(
            n_events="size", n_outliers="sum").reset_index()
        return res.astype(np.int64)

    return rel.bucketed_groups(ec, ["user_id"], _scan,
                               est_rows=_nrows(sf_dir, "events"))


SQL_EVENTS_ANOMALY = """
WITH ec AS (
  SELECT user_id, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v FROM events
),
st AS (
  SELECT user_id, COUNT(*) AS n, SUM(v) AS s, SUM(v * v) AS q
  FROM ec GROUP BY 1
)
SELECT e.user_id, CAST(ANY_VALUE(st.n) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN (st.n * e.v - st.s) * (st.n * e.v - st.s)
                          > 9 * (st.n * st.q - st.s * st.s)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM ec e JOIN st USING (user_id)
GROUP BY e.user_id
"""


def q_lineitem_corr(sf_dir: str):  # exact oracle (integer moment sums)
    """Grouped BIVARIATE moments — the exact integer pieces of Pearson r /
    the OLS slope between quantity and price per (returnflag, linestatus):
    n, Σx, Σy, Σx², Σy², Σxy (y in whole currency units so Σy² stays well
    inside int64 at any scale: y<=104999 → y²<=1.1e10, 6e5 rows → 6.6e15).
    All sums build MAP-SIDE (combiner) — the shuffle carries 6 ints per
    (group, batch), the classic one-pass parallel-statistics shape."""
    li = _rp(sf_dir, "lineitem",
             ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])

    def _mom(df: pd.DataFrame) -> pd.DataFrame:
        x = np.floor(df["l_quantity"].to_numpy()).astype(np.int64)
        y = np.floor(df["l_extendedprice"].to_numpy()).astype(np.int64)
        return pd.DataFrame({"rf": df["l_returnflag"], "ls": df["l_linestatus"],
                             "sum_x": x, "sum_y": y, "sum_xx": x * x,
                             "sum_yy": y * y, "sum_xy": x * y})

    mom = li.map_batches(_mom, batch_format="pandas", batch_size=8192)
    return rel.partial_groupby_sum(
        mom, ["rf", "ls"], ["sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy"],
        count_as="n")


SQL_LINEITEM_CORR = """
WITH lc AS (
  SELECT l_returnflag AS rf, l_linestatus AS ls,
         CAST(FLOOR(l_quantity) AS BIGINT) AS x,
         CAST(FLOOR(l_extendedprice) AS BIGINT) AS y
  FROM lineitem
)
SELECT rf, ls,
       CAST(SUM(x) AS BIGINT) AS sum_x, CAST(SUM(y) AS BIGINT) AS sum_y,
       CAST(SUM(x * x) AS BIGINT) AS sum_xx,
       CAST(SUM(y * y) AS BIGINT) AS sum_yy,
       CAST(SUM(x * y) AS BIGINT) AS sum_xy,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lc GROUP BY rf, ls
"""


def q_doc_chunk_overlap(sf_dir: str):  # exact oracle (range + list slice)
    """RAG-index chunking (``textops.chunk_documents``): overlapping token
    windows (32 tokens, stride 24) per document with exact per-chunk token
    counts and character sums. Map-only — text never shuffles."""
    docs = _rp(sf_dir, "documents", ["doc_id", "text"])
    return textops.chunk_documents(docs, window=32, stride=24)


SQL_DOC_CHUNK_OVERLAP = """
WITH ws AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[0-9a-z_]+') AS w
  FROM documents
),
nn AS (SELECT doc_id, w, len(w) AS n FROM ws WHERE len(w) > 0),
ch AS (
  SELECT doc_id, w, n,
         unnest(range(0, 1 + greatest(0, (n - 32 + 23) // 24))) AS c
  FROM nn
)
SELECT doc_id, CAST(c AS BIGINT) AS chunk_id,
       CAST(c * 24 AS BIGINT) AS start_tok,
       CAST(least(32, n - c * 24) AS BIGINT) AS n_toks,
       CAST(list_aggregate(list_transform(
              w[c * 24 + 1 : c * 24 + least(32, n - c * 24)],
              t -> len(t)), 'sum') AS BIGINT) AS sum_tok_len
FROM ch
"""


def q_tile_link_jaccard(sf_dir: str):  # exact oracle (wedge self-join)
    """LINK PREDICTION over the tile kNN graph: for every source pair
    sharing >=1 out-neighbor, the common-neighbor count, the Jaccard score
    over their (constant-degree) kNN lists as an exact integer quotient,
    and whether the pair is already an edge. Wedges enumerate DISTRIBUTED
    (one target-bucketed shuffle, vectorized pair fan-out per bucket, then
    a pair-keyed partial combine); the is_edge flag attaches map-side from
    a broadcast edge-code set that is tile-table-sized by construction."""
    from ..stages.spatial import knn_join
    from ..stages.util import cached_state

    part = _rp(sf_dir, "part", ["p_partkey", "p_size"])

    def _probes(batch: pa.Table) -> pa.Table:
        t = td.tiles_batch(batch)
        keep = pa.array(t["tile_id"].to_numpy() % 10 == 0)
        t = t.filter(keep)
        return pa.table({"src_tile": t["tile_id"], "px": t["cx"],
                         "py": t["cy"]})

    probes = part.map_batches(_probes, batch_format="pyarrow",
                              batch_size=32768)
    knn = knn_join(probes, conflation.tiles_ref(sf_dir), k=4,
                   x_col="px", y_col="py", carry_cols=["src_tile"])

    def _edges(batch: pa.Table) -> pa.Table:
        keep = pc.greater_equal(batch["knn_rank"], 2)
        t = batch.filter(keep)
        return pa.table({"src": t["src_tile"], "tgt": t["tile_id"]})

    edges = knn.map_batches(_edges, batch_format="pyarrow")

    # edge-code set for is_edge: bounded by |tiles|/10 * 3 rows (the
    # decimated source set), same size class as the broadcast tile table
    eddf = edges.to_pandas()
    m = eddf[eddf["tgt"] % 10 == 0]
    u = np.minimum(m["src"].to_numpy(np.int64), m["tgt"].to_numpy(np.int64))
    v = np.maximum(m["src"].to_numpy(np.int64), m["tgt"].to_numpy(np.int64))
    ecodes_ref = ray.put(np.unique(u * np.int64(1_000_003) + v))

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        mm = df.merge(df, on="tgt", suffixes=("_a", "_b"))
        mm = mm[mm["src_a"] < mm["src_b"]]
        out = (mm.groupby(["src_a", "src_b"], sort=True).size()
                 .reset_index(name="n_common"))
        return out.rename(columns={"src_a": "tile_a", "src_b": "tile_b"})

    pairs = rel.bucketed_groups(edges, ["tgt"], _pairs)
    pairs = rel.partial_groupby_sum(pairs, ["tile_a", "tile_b"],
                                    ["n_common"])

    def _flags(batch: pa.Table) -> pa.Table:
        codes = cached_state(ecodes_ref, lambda c: c, token="tile_edge_codes")
        a = batch["tile_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["tile_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        nc = batch["n_common"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "tile_a": a, "tile_b": b, "n_common": nc,
            "jaccard_q4": (10_000 * nc) // (6 - nc),
            "is_edge": np.isin(a * np.int64(1_000_003) + b, codes),
        })

    return pairs.map_batches(_flags, batch_format="pyarrow")


SQL_TILE_LINK_JACCARD = f"""
WITH tiles AS ({td.TILES_SQL}),
probes AS (SELECT tile_id AS src, cx AS px, cy AS py
           FROM tiles WHERE tile_id % 10 = 0),
e AS (
  SELECT src, tgt FROM (
    SELECT p.src, t.tile_id AS tgt,
           ROW_NUMBER() OVER (
             PARTITION BY p.src
             ORDER BY (p.px - t.cx) * (p.px - t.cx)
                    + (p.py - t.cy) * (p.py - t.cy), t.tile_id) AS rn
    FROM probes p CROSS JOIN tiles t) WHERE rn BETWEEN 2 AND 4
),
pairs AS (
  SELECT a.src AS tile_a, b.src AS tile_b,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM e a JOIN e b ON a.tgt = b.tgt AND a.src < b.src
  GROUP BY 1, 2
),
ed AS (SELECT DISTINCT LEAST(src, tgt) AS u, GREATEST(src, tgt) AS v
       FROM e WHERE tgt % 10 = 0)
SELECT p.tile_a, p.tile_b, p.n_common,
       CAST((10000 * p.n_common) // (6 - p.n_common) AS BIGINT) AS jaccard_q4,
       ed.u IS NOT NULL AS is_edge
FROM pairs p LEFT JOIN ed ON ed.u = p.tile_a AND ed.v = p.tile_b
"""


def q_grid_box_blur(sf_dir: str):  # exact oracle (9-offset self-join)
    """Raster smoothing (``spatial.grid_box_blur``): 3x3 box-filter sums
    over the probe-point density grid, emitted per occupied cell with the
    occupied-neighbor count. Post-collapse exchanges are grid-sized."""
    pts = conflation.read_points(sf_dir)
    return spatial.grid_box_blur(pts, "px", "py", cell=1024)


SQL_GRID_BOX_BLUR = _CTES + """,
cells AS (
  SELECT px // 1024 AS cx, py // 1024 AS cy, COUNT(*) AS v
  FROM points GROUP BY 1, 2
)
SELECT a.cx, a.cy, CAST(a.v AS BIGINT) AS v,
       CAST(SUM(b.v) AS BIGINT) AS blur_sum,
       CAST(COUNT(*) AS BIGINT) AS n_nbrs
FROM cells a JOIN cells b
  ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
 AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
GROUP BY a.cx, a.cy, a.v
"""


def q_image_filter_stats(sf_dir: str):  # exact oracle (fixture closed form)
    """Multimodal pre-training QUALITY FILTER (``media.ImageFilterFlags``,
    the LAION-style keep/drop pass): min pixel area, 2:1 aspect bound, and
    caption-length floor, with dims taken from the DECODED pixels through
    all three codecs. The fixture's (w, h, caption) grid hits pass AND
    fail cases of every rule; the oracle mirrors the synthesis closed
    form, so a dimension bug in any decoder breaks the hash."""
    from ..functions import codecs

    docs = _rp(sf_dir, "documents", ["doc_id"])
    fmts3 = ["bmp", "png", "jpeg"]

    def _synth(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs, fmts, caps = [], [], []
        for i in ids:
            w, h = int(16 + (i % 4) * 8), int(12 + (i % 3) * 6)
            grad = ((np.arange(w, dtype=np.int64) * 55) // (w - 1)).astype(np.uint8)
            img = np.empty((h, w, 3), dtype=np.uint8)
            img[:, :, 0] = np.uint8((i * 7) % 200) + grad[None, :]
            img[:, :, 1] = (i * 11) % 200
            img[:, :, 2] = (i * 3) % 200
            fmt = fmts3[int(i % 3)]
            blobs.append(codecs.encode(img, fmt))
            fmts.append(fmt)
            caps.append(f"cap-{i}")
        return pa.table(
            {
                "image_id": ids,
                "bytes": pa.array(blobs, type=pa.binary()),
                "fmt": pa.array(fmts, type=pa.string()),
                "caption": pa.array(caps, type=pa.string()),
            }
        )

    synth = docs.map_batches(_synth, batch_format="pyarrow", batch_size=512)
    return mstage.image_filter_flags(synth, min_cap_len=7, batch_size=512)


SQL_IMAGE_FILTER_STATS = """
WITH im AS (
  SELECT doc_id AS image_id,
         16 + (doc_id % 4) * 8 AS w, 12 + (doc_id % 3) * 6 AS h,
         CASE doc_id % 3 WHEN 0 THEN 'bmp' WHEN 1 THEN 'png'
              ELSE 'jpeg' END AS fmt,
         'cap-' || CAST(doc_id AS VARCHAR) AS caption
  FROM documents
)
SELECT image_id, fmt,
       w * h >= 300 AS area_ok,
       GREATEST(w, h) <= 2 * LEAST(w, h) AS aspect_ok,
       len(caption) >= 7 AS cap_ok,
       (w * h >= 300 AND GREATEST(w, h) <= 2 * LEAST(w, h)
        AND len(caption) >= 7) AS keep
FROM im
"""


def q_doc_bpe_pairs(sf_dir: str):  # exact oracle (adjacent-pair unnest)
    """One tokenizer-training MERGE ROUND (``textops.bpe_pair_topk``): the
    corpus's top-50 adjacent word-token pairs with deterministic
    (count desc, pair asc) ties. Text never shuffles — only (pair, n)
    partials ride the bucketed combine; the final merge is k·B-bounded."""
    docs = _rp(sf_dir, "documents", ["text"])
    return textops.bpe_pair_topk(docs, k=50,
                                 est_rows=_nrows(sf_dir, "documents"))


SQL_DOC_BPE_PAIRS = """
WITH ws AS (
  SELECT regexp_extract_all(lower(text), '[0-9a-z_]+') AS w FROM documents
),
adj AS (
  SELECT w[j] || ' ' || w[j + 1] AS pair
  FROM ws, (SELECT unnest(range(1, 200)) AS j) js
  WHERE j < len(w)
),
cnt AS (SELECT pair, CAST(COUNT(*) AS BIGINT) AS n FROM adj GROUP BY pair)
SELECT pair, n FROM cnt ORDER BY n DESC, pair LIMIT 50
"""


def q_traj_resample(sf_dir: str):  # exact oracle (lead window + range unnest)
    """Trajectory RESAMPLING onto a fixed grid (``spatial.traj_resample``):
    irregular per-trajectory observations -> positions at every multiple
    of 8 inside the observed span, integer-floor linear interpolation
    between bracketing points. The synthetic traces reuse the stay-point
    fixture's id arithmetic but with IRREGULAR gaps (seq = 2q + parity
    bit) so the interpolation path genuinely exercises off-observation
    sample times."""
    ev = _rp(sf_dir, "events", ["event_id"])
    nk = 50

    def _synth(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        traj = eid % nk
        q = eid // nk
        seq = q * 2 + (q * 2654435761) % 2
        x = traj * 100000 + (q * 2654435761) % 997
        y = (q * 40503) % 797
        return pa.table({"traj_id": traj, "seq": seq,
                         "x": x.astype(np.int64), "y": y.astype(np.int64)})

    pts = ev.map_batches(_synth, batch_format="pyarrow", batch_size=8192)
    return spatial.traj_resample(pts, "traj_id", "seq", "x", "y", step=8,
                                 est_rows=_nrows(sf_dir, "events"))


SQL_TRAJ_RESAMPLE = """
WITH obs AS (
  SELECT event_id % 50 AS traj_id,
         (event_id // 50) * 2 + ((event_id // 50) * 2654435761) % 2 AS seq,
         (event_id % 50) * 100000
           + ((event_id // 50) * 2654435761) % 997 AS x,
         ((event_id // 50) * 40503) % 797 AS y
  FROM events
),
nxt AS (
  SELECT traj_id, seq, x, y,
         lead(seq) OVER w AS s1, lead(x) OVER w AS x1, lead(y) OVER w AS y1
  FROM obs WINDOW w AS (PARTITION BY traj_id ORDER BY seq)
),
mid AS (
  SELECT traj_id,
         unnest(range(((seq + 7) // 8) * 8, s1, 8)) AS t,
         seq, s1, x, x1, y, y1
  FROM nxt WHERE s1 IS NOT NULL
),
lerp AS (
  SELECT traj_id, t,
         x + (x1 - x) * (t - seq) // (s1 - seq) AS x_i,
         y + (y1 - y) * (t - seq) // (s1 - seq) AS y_i
  FROM mid
  UNION ALL
  SELECT traj_id, seq AS t, x AS x_i, y AS y_i
  FROM nxt WHERE s1 IS NULL AND seq % 8 = 0
)
SELECT traj_id, CAST(t AS BIGINT) AS t, CAST(x_i AS BIGINT) AS x_i,
       CAST(y_i AS BIGINT) AS y_i
FROM lerp
"""


def q_image_pixel_dedup(sf_dir: str):  # exact oracle (fixture closed form)
    """EXACT image dedup on DECODED PIXELS (the multimodal sibling of
    ``doc_exact_dedup`` — catches byte-level re-encodes that byte hashing
    misses and that phash only near-matches): every payload decodes in an
    actor pool, a blake2b digest of (dims, raw pixels) folds to int64, and
    one hash-bucketed pass elects the canonical survivor (min image_id)
    and counts copies. The fixture plants true duplicate groups (all ids
    sharing ``doc_id % 30`` render identical pixels THROUGH the same
    codec), so the oracle is the id-arithmetic closed form; the engine
    never sees the residue — only pixels."""
    from ..functions import codecs

    docs = _rp(sf_dir, "documents", ["doc_id"])
    fmts3 = ["bmp", "png", "jpeg"]

    def _synth(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs, fmts = [], []
        for i in ids:
            j = int(i % 30)
            w, h = 16 + (j % 4) * 8, 12 + (j % 3) * 6
            grad = ((np.arange(w, dtype=np.int64) * 55) // (w - 1)).astype(np.uint8)
            img = np.empty((h, w, 3), dtype=np.uint8)
            img[:, :, 0] = np.uint8((j * 7) % 200) + grad[None, :]
            img[:, :, 1] = (j * 11) % 200
            img[:, :, 2] = (j * 3) % 200
            fmt = fmts3[j % 3]
            blobs.append(codecs.encode(img, fmt))
            fmts.append(fmt)
        return pa.table({
            "image_id": ids,
            "bytes": pa.array(blobs, type=pa.binary()),
            "fmt": pa.array(fmts, type=pa.string()),
        })

    synth = docs.map_batches(_synth, batch_format="pyarrow", batch_size=512)

    import hashlib

    def _pixhash(batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_numpy(zero_copy_only=False)
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        hs = np.zeros(len(ids), dtype=np.int64)
        for i in range(len(ids)):
            img = codecs.decode(blobs[i], fmts[i])
            d = hashlib.blake2b(img.shape[0].to_bytes(4, "little")
                                + img.shape[1].to_bytes(4, "little")
                                + img.tobytes(), digest_size=8).digest()
            hs[i] = np.int64(int.from_bytes(d, "little") >> 1)
        return pa.table({"image_id": ids, "pix_hash": hs})

    hashed = synth.map_batches(_pixhash, batch_format="pyarrow",
                               batch_size=512)

    def _elect(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("pix_hash", sort=False)["image_id"]
        st = g.agg(keep_id="min", n_copies="size")
        m = df.merge(st, left_on="pix_hash", right_index=True)
        out = m[["image_id", "keep_id", "n_copies"]].astype(np.int64)
        return out

    return rel.bucketed_groups(hashed, ["pix_hash"], _elect,
                               est_rows=_nrows(sf_dir, "documents"))


SQL_IMAGE_PIXEL_DEDUP = """
SELECT doc_id AS image_id,
       CAST(MIN(doc_id) OVER (PARTITION BY doc_id % 30) AS BIGINT) AS keep_id,
       CAST(COUNT(*) OVER (PARTITION BY doc_id % 30) AS BIGINT) AS n_copies
FROM documents
"""


def q_events_rate_limit(sf_dir: str):  # exact oracle (recursive-CTE replay)
    """Token-bucket ADMISSION CONTROL (``windows.rate_limit_by_key``): per
    user, replay the event stream against a bucket of capacity 3 refilling
    one token per 10 minutes — the ingest rate limiter of any event
    pipeline, exactly (all-integer µs timestamps, floor refill). Keys are
    shuffle-parallel; the recursive-CTE oracle replays the identical
    sequential steps the way ``events_ewma``'s does."""
    from ..stages.windows import rate_limit_by_key

    ev = _rp(sf_dir, "events", ["event_id", "user_id", "ts"])

    def _pre(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"].cast(pa.int64()),
            "ts": batch["ts"].cast(pa.int64()),
            "event_id": batch["event_id"].cast(pa.int64()),
        })

    prep = ev.map_batches(_pre, batch_format="pyarrow", batch_size=8192)
    return rate_limit_by_key(prep, "user_id", ["ts", "event_id"], "ts",
                             cap=3, period=600_000_000)


SQL_EVENTS_RATE_LIMIT = """
WITH RECURSIVE ev AS MATERIALIZED (
  SELECT user_id, CAST(ts AS BIGINT) AS t,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS BIGINT) AS rn
  FROM (SELECT user_id, epoch_us(ts) AS ts, event_id FROM events)
),
nn AS (SELECT user_id, MAX(rn) AS n FROM ev GROUP BY user_id),
r AS (
  SELECT user_id, rn, t, 2 AS tokens, 1 AS admitted FROM ev WHERE rn = 1
  UNION ALL
  -- refill from the PREVIOUS event time, clamp to cap 3, then admit+spend
  SELECT e.user_id, e.rn, e.t,
         CASE WHEN LEAST(3, r.tokens + (e.t - r.t) // 600000000) >= 1
              THEN LEAST(3, r.tokens + (e.t - r.t) // 600000000) - 1
              ELSE LEAST(3, r.tokens + (e.t - r.t) // 600000000) END,
         r.admitted + CASE WHEN LEAST(3, r.tokens + (e.t - r.t)
                                        // 600000000) >= 1
                           THEN 1 ELSE 0 END
  FROM r JOIN ev e ON e.user_id = r.user_id AND e.rn = r.rn + 1
)
SELECT r.user_id, nn.n AS n_events,
       CAST(r.admitted AS BIGINT) AS n_admitted,
       CAST(r.tokens AS BIGINT) AS tokens_final
FROM r JOIN nn ON nn.user_id = r.user_id AND r.rn = nn.n
"""


def q_grid_hotspots(sf_dir: str):  # exact oracle (blur + global total)
    """Density HOTSPOT detection (Getis-Ord-shaped, integer-exact): a cell
    is hot iff its 3x3 neighborhood MEAN exceeds twice the global mean —
    the cross-multiplied predicate blur_sum·N_cells > 2·n_nbrs·Σv, so no
    division anywhere. Composes ``spatial.grid_box_blur`` with a global
    total; the flagging pass runs on the GRID-sized blur table (<=4096
    rows, documented bounded), everything data-sized stays map-side."""
    pts = conflation.read_points(sf_dir)
    blur = spatial.grid_box_blur(pts, "px", "py", cell=1024).to_pandas()
    n_cells = np.int64(len(blur))
    sum_v = np.int64(blur["v"].sum())
    blur["hotspot"] = (blur["blur_sum"].to_numpy(np.int64) * n_cells
                       > 2 * blur["n_nbrs"].to_numpy(np.int64) * sum_v)
    return blur[["cx", "cy", "v", "blur_sum", "n_nbrs", "hotspot"]]


SQL_GRID_HOTSPOTS = _CTES + """,
cells AS (
  SELECT px // 1024 AS cx, py // 1024 AS cy, COUNT(*) AS v
  FROM points GROUP BY 1, 2
),
blur AS (
  SELECT a.cx, a.cy, a.v, SUM(b.v) AS blur_sum, COUNT(*) AS n_nbrs
  FROM cells a JOIN cells b
    ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
   AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
  GROUP BY a.cx, a.cy, a.v
),
tot AS (SELECT COUNT(*) AS nc, SUM(v) AS sv FROM cells)
SELECT cx, cy, CAST(v AS BIGINT) AS v, CAST(blur_sum AS BIGINT) AS blur_sum,
       CAST(n_nbrs AS BIGINT) AS n_nbrs,
       blur_sum * tot.nc > 2 * n_nbrs * tot.sv AS hotspot
FROM blur, tot
"""


def q_doc_boolean_search(sf_dir: str):  # exact oracle (list_filter counts)
    """Boolean AND keyword search with integer relevance: documents
    containing ALL of {merge, window, vector}, with per-term frequencies
    and a length-normalized score ((Σtf)·1000 // n_tokens). Map-only — the
    query terms are a constant broadcast in the closure, text never
    shuffles; this is the retrieval probe an inverted index answers,
    expressed as the engine's scan-side fallback."""
    from ..functions.text import _WORD_ASCII_RE

    terms = ("merge", "window", "vector")
    docs = _rp(sf_dir, "documents", ["doc_id", "text"])

    def _tf(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch["text"].to_pylist()
        keep, tfs, scores = [], [], []
        for did, t in zip(ids, texts):
            ws = _WORD_ASCII_RE.findall((t or "").lower())
            c = [sum(1 for w in ws if w == term) for term in terms]
            if all(c) and ws:
                keep.append(did)
                tfs.append(c)
                scores.append(sum(c) * 1000 // len(ws))
        tfs = np.array(tfs, dtype=np.int64).reshape(-1, 3)
        return pa.table({
            "doc_id": np.array(keep, dtype=np.int64),
            "tf_merge": tfs[:, 0], "tf_window": tfs[:, 1],
            "tf_vector": tfs[:, 2],
            "score_q3": np.array(scores, dtype=np.int64),
        })

    return docs.map_batches(_tf, batch_format="pyarrow", batch_size=1024)


SQL_DOC_BOOLEAN_SEARCH = """
WITH ws AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[0-9a-z_]+') AS w
  FROM documents
),
tf AS (
  SELECT doc_id, len(w) AS n,
         len(list_filter(w, x -> x = 'merge')) AS tf_merge,
         len(list_filter(w, x -> x = 'window')) AS tf_window,
         len(list_filter(w, x -> x = 'vector')) AS tf_vector
  FROM ws
)
SELECT doc_id, CAST(tf_merge AS BIGINT) AS tf_merge,
       CAST(tf_window AS BIGINT) AS tf_window,
       CAST(tf_vector AS BIGINT) AS tf_vector,
       CAST((tf_merge + tf_window + tf_vector) * 1000 // n AS BIGINT)
         AS score_q3
FROM tf
WHERE tf_merge > 0 AND tf_window > 0 AND tf_vector > 0
"""


def q_snapshot_scd2(sf_dir: str):  # exact oracle (lead window)
    """SCD TYPE-2 dimension history (``windows.scd2_intervals``): the event
    change stream becomes per-key validity intervals [from, to) with an
    open-ended current row — the history-preserving sibling of
    ``snapshot_upsert``'s latest-wins MERGE. Sentinel 2^62 instead of NULL
    keeps the hash comparison representation-safe."""
    from ..stages.windows import scd2_intervals

    ev = _rp(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def _pre(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"].cast(pa.int64()),
            "us": batch["ts"].cast(pa.int64()),
            "event_id": batch["event_id"].cast(pa.int64()),
            "value_c": cents(batch["value"].to_numpy(zero_copy_only=False)),
        })

    prep = ev.map_batches(_pre, batch_format="pyarrow", batch_size=8192)
    return scd2_intervals(prep, "user_id", ["us", "event_id"], "us",
                          "value_c")


SQL_SNAPSHOT_SCD2 = """
WITH ec AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS value_c
  FROM events
)
SELECT user_id, CAST(us AS BIGINT) AS valid_from_us,
       CAST(COALESCE(lead(us) OVER w, 4611686018427387904) AS BIGINT)
         AS valid_to_us,
       value_c,
       lead(us) OVER w IS NULL AS is_current
FROM ec WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
"""


def q_events_late_arrivals(sf_dir: str):  # exact oracle (running-max window)
    """WATERMARK ACCOUNTING: events replayed in (deterministically
    scrambled) ARRIVAL order; an event is late iff its event time is
    behind the per-user running-max watermark, with exact µs lateness
    sums/maxima — the metric that sizes allowed-lateness in any streaming
    job. The running max is one pandas cummax per bucket (vectorized);
    keys shuffle-parallel in ONE exchange."""
    ev = _rp(sf_dir, "events", ["event_id", "user_id", "ts"])

    def _pre(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": batch["user_id"].cast(pa.int64()),
            "us": batch["ts"].cast(pa.int64()),
            "event_id": eid,
            "arr": eid + ((eid * 2654435761) % 7) * 1000,
        })

    prep = ev.map_batches(_pre, batch_format="pyarrow", batch_size=8192)

    def _scan(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["user_id", "arr", "event_id"], kind="mergesort")
        cm = d.groupby("user_id", sort=False)["us"].cummax()
        prev_max = cm.groupby(d["user_id"], sort=False).shift(1)
        us = d["us"].to_numpy(np.int64)
        late = prev_max.notna().to_numpy() & (us < prev_max.fillna(0).to_numpy(np.int64))
        lateness = np.where(late, prev_max.fillna(0).to_numpy(np.int64) - us, 0)
        out = pd.DataFrame({"user_id": d["user_id"].to_numpy(np.int64),
                            "late": late.astype(np.int64),
                            "lateness": lateness.astype(np.int64)})
        res = out.groupby("user_id", sort=True).agg(
            n_events=("late", "size"), n_late=("late", "sum"),
            max_lateness_us=("lateness", "max"),
            total_lateness_us=("lateness", "sum")).reset_index()
        return res.astype(np.int64)

    return rel.bucketed_groups(prep, ["user_id"], _scan,
                               est_rows=_nrows(sf_dir, "events"))


SQL_EVENTS_LATE_ARRIVALS = """
WITH ec AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
         event_id + ((event_id * 2654435761) % 7) * 1000 AS arr
  FROM events
),
wm AS (
  SELECT user_id, us,
         MAX(us) OVER (PARTITION BY user_id ORDER BY arr, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM ec
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN us < prev_max THEN 1 ELSE 0 END) AS BIGINT)
         AS n_late,
       CAST(COALESCE(MAX(CASE WHEN us < prev_max THEN prev_max - us END), 0)
            AS BIGINT) AS max_lateness_us,
       CAST(COALESCE(SUM(CASE WHEN us < prev_max THEN prev_max - us END), 0)
            AS BIGINT) AS total_lateness_us
FROM wm GROUP BY user_id
"""


def q_customer_rfm(sf_dir: str):  # exact oracle (grouped agg + CASE buckets)
    """RFM SEGMENTATION (recency / frequency / monetary) — the classic
    customer-scoring rollup: per ordering customer, days since last order
    (vs the corpus anchor 2001-09-01), order count, lifetime cents; each
    bucketed on fixed integer thresholds and fused into one rfm_code.
    Grouped moments build in one bucketed pass; buckets are map-side."""
    ANCHOR_US = 996_624_000_000_000  # 2001-09-01 00:00:00 UTC in µs
    orders = _rp(sf_dir, "orders",
                 ["o_custkey", "o_orderdate", "o_totalprice"])

    def _pre(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": batch["o_custkey"].cast(pa.int64()),
            "us": batch["o_orderdate"].cast(pa.int64()),
            "price_c": cents(batch["o_totalprice"].to_numpy(zero_copy_only=False)),
        })

    prep = orders.map_batches(_pre, batch_format="pyarrow", batch_size=8192)

    def _rfm(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_custkey", sort=True).agg(
            last_us=("us", "max"), f=("us", "size"), m_c=("price_c", "sum"))
        rec_days = (ANCHOR_US - g["last_us"].to_numpy(np.int64)) // 86_400_000_000
        f = g["f"].to_numpy(np.int64)
        m = g["m_c"].to_numpy(np.int64)
        r_b = np.where(rec_days < 180, 3,
                       np.where(rec_days < 365, 2,
                                np.where(rec_days < 730, 1, 0)))
        f_b = np.where(f >= 12, 3, np.where(f >= 6, 2, np.where(f >= 3, 1, 0)))
        m_b = np.where(m >= 100_000_000, 3,
                       np.where(m >= 50_000_000, 2,
                                np.where(m >= 10_000_000, 1, 0)))
        return pd.DataFrame({
            "o_custkey": g.index.to_numpy(np.int64),
            "recency_days": rec_days.astype(np.int64),
            "frequency": f, "monetary_c": m,
            "rfm_code": (r_b * 100 + f_b * 10 + m_b).astype(np.int64),
        })

    return rel.bucketed_groups(prep, ["o_custkey"], _rfm,
                               est_rows=_nrows(sf_dir, "orders"))


SQL_CUSTOMER_RFM = """
WITH o AS (
  SELECT o_custkey, epoch_us(o_orderdate) AS us,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
  FROM orders
),
g AS (
  SELECT o_custkey, MAX(us) AS last_us, COUNT(*) AS f, SUM(price_c) AS m_c
  FROM o GROUP BY o_custkey
),
b AS (
  SELECT o_custkey,
         (996624000000000 - last_us) // 86400000000 AS recency_days,
         f, m_c,
         CASE WHEN (996624000000000 - last_us) // 86400000000 < 180 THEN 3
              WHEN (996624000000000 - last_us) // 86400000000 < 365 THEN 2
              WHEN (996624000000000 - last_us) // 86400000000 < 730 THEN 1
              ELSE 0 END AS r_b,
         CASE WHEN f >= 12 THEN 3 WHEN f >= 6 THEN 2 WHEN f >= 3 THEN 1
              ELSE 0 END AS f_b,
         CASE WHEN m_c >= 100000000 THEN 3 WHEN m_c >= 50000000 THEN 2
              WHEN m_c >= 10000000 THEN 1 ELSE 0 END AS m_b
  FROM g
)
SELECT o_custkey, CAST(recency_days AS BIGINT) AS recency_days,
       CAST(f AS BIGINT) AS frequency, CAST(m_c AS BIGINT) AS monetary_c,
       CAST(r_b * 100 + f_b * 10 + m_b AS BIGINT) AS rfm_code
FROM b
"""


def _traj_xy(sf_dir: str):
    """The shared stay-point trajectory fixture (see q_traj_step_stats)."""
    ev = _rp(sf_dir, "events", ["event_id"])
    nk = 50

    def _synth(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        traj = eid % nk
        seq = eid // nk
        blk = seq // (8 + traj % 5)
        spike = np.where((seq * 7919) % 23 == 0, 40, 0)
        x = traj * 100000 + blk * 1000 + (seq * 2654435761) % 13 + spike
        y = blk * 1000 + (seq * 40503) % 11
        return pa.table({"traj_id": traj, "seq": seq,
                         "x": x.astype(np.int64), "y": y.astype(np.int64)})

    return ev.map_batches(_synth, batch_format="pyarrow", batch_size=8192)


_SQL_TRAJ_XY = """
  SELECT event_id % 50 AS traj_id, event_id // 50 AS seq,
         (event_id % 50) * 100000
           + ((event_id // 50) // (8 + (event_id % 50) % 5)) * 1000
           + ((event_id // 50) * 2654435761) % 13
           + CASE WHEN ((event_id // 50) * 7919) % 23 = 0
                  THEN 40 ELSE 0 END AS x,
         ((event_id // 50) // (8 + (event_id % 50) % 5)) * 1000
           + ((event_id // 50) * 40503) % 11 AS y
  FROM events
"""


def q_grid_flow_vectors(sf_dir: str):  # exact oracle (lag window + groupby)
    """Movement vector field (``spatial.flow_vectors``): per origin grid
    cell, step count and exact Σdx/Σdy over the trajectory traces — the
    OD-flow rasterization behind mobility heat-arrow maps."""
    pts = _traj_xy(sf_dir)
    return spatial.flow_vectors(pts, "traj_id", "seq", "x", "y", cell=4096,
                                est_rows=_nrows(sf_dir, "events"))


SQL_GRID_FLOW_VECTORS = f"""
WITH xy AS ({_SQL_TRAJ_XY}),
st AS (
  SELECT lag(x) OVER w AS ox, lag(y) OVER w AS oy,
         x - lag(x) OVER w AS dx, y - lag(y) OVER w AS dy
  FROM xy WINDOW w AS (PARTITION BY traj_id ORDER BY seq)
)
SELECT ox // 4096 AS cx, oy // 4096 AS cy,
       CAST(COUNT(*) AS BIGINT) AS n_steps,
       CAST(SUM(dx) AS BIGINT) AS sum_dx, CAST(SUM(dy) AS BIGINT) AS sum_dy
FROM st WHERE ox IS NOT NULL
GROUP BY 1, 2
"""


def q_traj_od_matrix(sf_dir: str):  # exact oracle (arg_min/arg_max)
    """Origin-destination matrix (``spatial.od_matrix``): trip counts
    between the first-observation and last-observation grid cells of each
    trajectory — the zone-to-zone mobility rollup."""
    pts = _traj_xy(sf_dir)
    return spatial.od_matrix(pts, "traj_id", "seq", "x", "y", cell=8192,
                             est_rows=_nrows(sf_dir, "events"))


SQL_TRAJ_OD_MATRIX = f"""
WITH xy AS ({_SQL_TRAJ_XY}),
ends AS (
  SELECT traj_id,
         arg_min(x, seq) // 8192 AS o_cx, arg_min(y, seq) // 8192 AS o_cy,
         arg_max(x, seq) // 8192 AS d_cx, arg_max(y, seq) // 8192 AS d_cy
  FROM xy GROUP BY traj_id
)
SELECT o_cx, o_cy, d_cx, d_cy, CAST(COUNT(*) AS BIGINT) AS n_trips
FROM ends GROUP BY 1, 2, 3, 4
"""


def q_orders_basket_lift(sf_dir: str):  # exact oracle (basket self-join)
    """MARKET-BASKET association mining with LIFT: part pairs co-purchased
    in >= 3 orders, with the exact integer pieces of lift — n_ab, the
    single-part order counts n_a/n_b, and lift_q4 = n_ab·N·10⁴ //
    (n_a·n_b). Baskets dedup map-side (distinct (order, part) partials),
    pairs fan out inside one order-bucketed shuffle and collapse to pair
    counts before the pair-keyed combine; the single-part count table is
    part-table-sized and attaches via broadcast (at larger part
    cardinality this attach becomes a join — documented trade-off)."""
    from ..stages.util import cached_state

    li = _rp(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    # distinct (order, part): a part twice in one order is ONE basket item
    basket = rel.partial_groupby_sum(li, ["l_orderkey", "l_partkey"], [],
                                     count_as="_dup")

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df[["l_orderkey", "l_partkey"]]
        mm = d.merge(d, on="l_orderkey", suffixes=("_a", "_b"))
        mm = mm[mm["l_partkey_a"] < mm["l_partkey_b"]]
        return (mm.groupby(["l_partkey_a", "l_partkey_b"], sort=False)
                  .size().reset_index(name="n_ab")
                  .rename(columns={"l_partkey_a": "part_a",
                                   "l_partkey_b": "part_b"}))

    pairs = rel.bucketed_groups(basket, ["l_orderkey"], _pairs,
                                est_rows=_nrows(sf_dir, "lineitem"))
    pairs = rel.partial_groupby_sum(pairs, ["part_a", "part_b"], ["n_ab"])

    # per-part order counts: part-table-sized -> broadcast for the attach
    pc_tab = (rel.partial_groupby_sum(basket, ["l_partkey"], [],
                                      count_as="n_orders")
              .to_pandas())
    counts_ref = ray.put((
        np.sort(pc_tab["l_partkey"].to_numpy(np.int64)),
        pc_tab["n_orders"].to_numpy(np.int64)[
            np.argsort(pc_tab["l_partkey"].to_numpy(np.int64), kind="stable")],
    ))
    n_orders_total = np.int64(_nrows(sf_dir, "orders"))

    def _lift(batch: pa.Table) -> pa.Table:
        ids, cnts = cached_state(counts_ref, lambda t: t,
                                 token="basket_part_counts")
        a = batch["part_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["part_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        nab = batch["n_ab"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = nab >= 3
        a, b, nab = a[keep], b[keep], nab[keep]
        na = cnts[np.searchsorted(ids, a)]
        nb = cnts[np.searchsorted(ids, b)]
        return pa.table({
            "part_a": a, "part_b": b, "n_ab": nab, "n_a": na, "n_b": nb,
            "lift_q4": nab * n_orders_total * 10_000 // (na * nb),
        })

    return pairs.map_batches(_lift, batch_format="pyarrow")


SQL_ORDERS_BASKET_LIFT = """
WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM basket a JOIN basket b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 3
),
pcnt AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n
         FROM basket GROUP BY 1),
tot AS (SELECT COUNT(*) AS n FROM orders)
SELECT p.part_a, p.part_b, p.n_ab, ca.n AS n_a, cb.n AS n_b,
       CAST(p.n_ab * tot.n * 10000 // (ca.n * cb.n) AS BIGINT) AS lift_q4
FROM pairs p
JOIN pcnt ca ON ca.l_partkey = p.part_a
JOIN pcnt cb ON cb.l_partkey = p.part_b
CROSS JOIN tot
"""


def q_inventory_reconcile(sf_dir: str):  # exact oracle (FULL OUTER JOIN)
    """FULL OUTER JOIN reconciliation — the snapshot-vs-observed audit every
    warehouse runs (the one join shape the registry lacked: J1/J3 cover
    inner/left, `customers_no_orders` anti; this is the two-sided outer).
    Left = large parts (p_size >= 25, expected inventory); right = observed
    high-quantity line flow per part. Each part lands in exactly one of
    both / left_only / right_only with the other side's measures defaulted.

    One shuffle total: both sides union into a single tagged stream with
    map-side partial aggregation (pre_fn), and the per-key merge happens in
    the bucketed combine — no separate build of the right side, no second
    exchange. At 100 TB this is the union-then-merge outer-join plan that
    beats a hash join when both sides are key-sparse after filtering."""
    part = _rp(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"])
    li = _rp(sf_dir, "lineitem", ["l_partkey", "l_quantity"])

    def _left(batch: pa.Table) -> pa.Table:
        m = pc.greater_equal(batch["p_size"], 25)
        t = batch.filter(m)
        k = t["p_partkey"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "p_partkey": k,
            "retail_c": cents(t["p_retailprice"].to_numpy(zero_copy_only=False)),
            "obs_qty_c": np.zeros(len(k), dtype=np.int64),
            "n_lines": np.zeros(len(k), dtype=np.int64),
            "has_l": np.ones(len(k), dtype=np.int64),
            "has_r": np.zeros(len(k), dtype=np.int64),
        })

    def _right(batch: pa.Table) -> pa.Table:
        m = pc.greater_equal(batch["l_quantity"], 45.0)
        t = batch.filter(m)
        k = t["l_partkey"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "p_partkey": k,
            "retail_c": np.full(len(k), -1, dtype=np.int64),
            "obs_qty_c": cents(t["l_quantity"].to_numpy(zero_copy_only=False)),
            "n_lines": np.ones(len(k), dtype=np.int64),
            "has_l": np.zeros(len(k), dtype=np.int64),
            "has_r": np.ones(len(k), dtype=np.int64),
        })

    both = part.map_batches(_left, batch_format="pyarrow", batch_size=8192).union(
        li.map_batches(_right, batch_format="pyarrow", batch_size=8192))

    agg = {"retail_c": "max", "obs_qty_c": "sum", "n_lines": "sum",
           "has_l": "max", "has_r": "max"}

    def _pre(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("p_partkey", as_index=False, sort=False).agg(agg)

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("p_partkey", as_index=False, sort=True).agg(agg)
        status = np.where(
            (g["has_l"].to_numpy() > 0) & (g["has_r"].to_numpy() > 0), "both",
            np.where(g["has_l"].to_numpy() > 0, "left_only", "right_only"))
        return pd.DataFrame({
            "p_partkey": g["p_partkey"].to_numpy(np.int64),
            "status": status,
            "retail_c": g["retail_c"].to_numpy(np.int64),
            "obs_qty_c": g["obs_qty_c"].to_numpy(np.int64),
            "n_lines": g["n_lines"].to_numpy(np.int64),
        })

    return rel.bucketed_groups(both, ["p_partkey"], _final, pre_fn=_pre,
                               est_rows=_nrows(sf_dir, "part"))


SQL_INVENTORY_RECONCILE = """
WITH l AS (
  SELECT p_partkey, CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) AS retail_c
  FROM part WHERE p_size >= 25
),
r AS (
  SELECT l_partkey AS p_partkey,
         CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS obs_qty_c,
         CAST(COUNT(*) AS BIGINT) AS n_lines
  FROM lineitem WHERE l_quantity >= 45.0 GROUP BY 1
)
SELECT CAST(COALESCE(l.p_partkey, r.p_partkey) AS BIGINT) AS p_partkey,
       CASE WHEN l.p_partkey IS NOT NULL AND r.p_partkey IS NOT NULL
              THEN 'both'
            WHEN l.p_partkey IS NOT NULL THEN 'left_only'
            ELSE 'right_only' END AS status,
       CAST(COALESCE(l.retail_c, -1) AS BIGINT) AS retail_c,
       CAST(COALESCE(r.obs_qty_c, 0) AS BIGINT) AS obs_qty_c,
       CAST(COALESCE(r.n_lines, 0) AS BIGINT) AS n_lines
FROM l FULL OUTER JOIN r ON l.p_partkey = r.p_partkey
"""


def q_events_autocorr(sf_dir: str):  # exact oracle (lead window + groupby)
    """Per-user LAG-1 AUTOCORRELATION moments — the serial-dependence screen
    time-series pipelines run before modeling (is this signal noise or
    trending?). Events order by (ts, event_id); each consecutive value pair
    (x_t, x_{t+1}) in cents contributes to the five exact integer moments
    (n, Σx, Σy, Σxy, Σx², Σy²) from which r is one division away — the
    division stays OUT of the data path so the oracle hashes exactly.

    One user-bucketed shuffle; the in-key pair formation is a vectorized
    shift per bucket. Moments are additive, so at 100 TB the same kernel
    runs as per-batch partials IF events arrive pre-sorted per key."""
    ev = _rp(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def _pre(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"].cast(pa.int64()),
            "us": batch["ts"].cast(pa.int64()),
            "event_id": batch["event_id"].cast(pa.int64()),
            "v_c": cents(batch["value"].to_numpy(zero_copy_only=False)),
        })

    prep = ev.map_batches(_pre, batch_format="pyarrow", batch_size=8192)

    def _moments(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["user_id", "us", "event_id"], kind="mergesort")
        u = d["user_id"].to_numpy(np.int64)
        v = d["v_c"].to_numpy(np.int64)
        # pair (x_t, x_{t+1}) within each user run
        nxt_same = np.empty(len(u), dtype=bool)
        if len(u):
            nxt_same[:-1] = u[:-1] == u[1:]
            nxt_same[-1] = False
        x = v[nxt_same]
        y = np.roll(v, -1)[nxt_same]
        uu = u[nxt_same]
        out = pd.DataFrame({"user_id": uu, "x": x, "y": y,
                            "xy": x * y, "xx": x * x, "yy": y * y})
        res = out.groupby("user_id", sort=True).agg(
            n_pairs=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
            sxy=("xy", "sum"), sxx=("xx", "sum"), syy=("yy", "sum"),
        ).reset_index()
        return res.astype(np.int64)

    return rel.bucketed_groups(prep, ["user_id"], _moments,
                               est_rows=_nrows(sf_dir, "events"))


SQL_EVENTS_AUTOCORR = """
WITH ec AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v_c
  FROM events
),
p AS (
  SELECT user_id, v_c AS x,
         LEAD(v_c) OVER (PARTITION BY user_id ORDER BY us, event_id) AS y
  FROM ec
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
       CAST(SUM(x * y) AS BIGINT) AS sxy,
       CAST(SUM(x * x) AS BIGINT) AS sxx,
       CAST(SUM(y * y) AS BIGINT) AS syy
FROM p WHERE y IS NOT NULL GROUP BY user_id
"""


def q_customer_percent_rank(sf_dir: str):  # exact oracle (RANK window)
    """Exact PERCENT_RANK within market segment — the normalized-score
    primitive behind feature scaling and cohort percentile reporting. Ties
    share the min rank (SQL RANK semantics); the percentile is kept as the
    exact integer basis-point floor ((rnk-1)*10000 // (n-1)) so no float
    division enters the hash. Single segment-bucketed shuffle; rank + size
    are one vectorized pass per bucket."""
    cust = _rp(sf_dir, "customer", ["c_custkey", "c_mktsegment", "c_acctbal"])

    def _pre(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": batch["c_custkey"].cast(pa.int64()),
            "seg": batch["c_mktsegment"],
            "bal_c": cents(batch["c_acctbal"].to_numpy(zero_copy_only=False)),
        })

    prep = cust.map_batches(_pre, batch_format="pyarrow", batch_size=8192)

    def _rank(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["seg", "bal_c", "c_custkey"], kind="mergesort")
        rnk = d.groupby("seg", sort=False)["bal_c"].rank(method="min").astype(np.int64)
        n = d.groupby("seg", sort=False)["bal_c"].transform("size").astype(np.int64)
        denom = np.maximum(n.to_numpy() - 1, 1)
        pr_bp = ((rnk.to_numpy() - 1) * 10000) // denom
        pr_bp = np.where(n.to_numpy() > 1, pr_bp, 0)
        return pd.DataFrame({
            "c_custkey": d["c_custkey"].to_numpy(np.int64),
            "seg": d["seg"].to_numpy(),
            "bal_c": d["bal_c"].to_numpy(np.int64),
            "rnk": rnk.to_numpy(),
            "pr_bp": pr_bp.astype(np.int64),
        })

    return rel.bucketed_groups(prep, ["seg"], _rank,
                               est_rows=_nrows(sf_dir, "customer"))


SQL_CUSTOMER_PERCENT_RANK = """
WITH b AS (
  SELECT c_custkey, c_mktsegment AS seg,
         CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_c
  FROM customer
),
r AS (
  SELECT c_custkey, seg, bal_c,
         RANK() OVER (PARTITION BY seg ORDER BY bal_c) AS rnk,
         COUNT(*) OVER (PARTITION BY seg) AS n
  FROM b
)
SELECT c_custkey, seg, bal_c, CAST(rnk AS BIGINT) AS rnk,
       CAST(CASE WHEN n > 1 THEN ((rnk - 1) * 10000) // (n - 1)
                 ELSE 0 END AS BIGINT) AS pr_bp
FROM r
"""


def q_geohash_cells(sf_dir: str):  # exact oracle (bit-spread CTE + base32)
    """GEOHASH-style base32 string cell rollup — the string-keyed member of
    the locality-key family (Morton int64 `cell_point_counts`, Hilbert
    `hilbert_cells`, quadkey `quadkey_rollup`; ≙ the reference's base-36
    geo-proximity key, `getGeoProximityKey.js:8-46`, which is ALSO a string
    cell key). 20 bits at precision 4, x in the MSB role per the public
    geohash spec; counts and qty cents pre-aggregate map-side so the shuffle
    is cell-sized. The oracle reproduces the bit interleave with the same
    spread-shift-mask constants and base32 substring lookups."""
    from ..functions.cells import geohash_cell

    pts = conflation.read_points(sf_dir)

    def _gh(batch: pa.Table) -> pa.Table:
        gh = geohash_cell(
            batch["px"].to_numpy(zero_copy_only=False),
            batch["py"].to_numpy(zero_copy_only=False), 4)
        return pa.table({
            "geohash": pa.array(gh),
            "qty_c": cents(batch["l_quantity"].to_numpy(zero_copy_only=False)),
        })

    cells = pts.map_batches(_gh, batch_format="pyarrow", batch_size=8192)
    return rel.partial_groupby_sum(cells, ["geohash"], ["qty_c"],
                                   count_as="n_points")


SQL_GEOHASH_CELLS = _CTES + """
, g AS (
  SELECT px // 64 AS xq, py // 64 AS yq,
         CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) AS qty_c
  FROM points
),
s1 AS (SELECT qty_c, ((xq | (xq << 16)) & 281470681808895) AS xa,
               ((yq | (yq << 16)) & 281470681808895) AS ya FROM g),
s2 AS (SELECT qty_c, ((xa | (xa << 8)) & 71777214294589695) AS xb,
               ((ya | (ya << 8)) & 71777214294589695) AS yb FROM s1),
s3 AS (SELECT qty_c, ((xb | (xb << 4)) & 1085102592571150095) AS xc,
               ((yb | (yb << 4)) & 1085102592571150095) AS yc FROM s2),
s4 AS (SELECT qty_c, ((xc | (xc << 2)) & 3689348814741910323) AS xd,
               ((yc | (yc << 2)) & 3689348814741910323) AS yd FROM s3),
s5 AS (SELECT qty_c, ((xd | (xd << 1)) & 6148914691236517205) AS xe,
               ((yd | (yd << 1)) & 6148914691236517205) AS ye FROM s4),
c AS (SELECT qty_c, (xe << 1) | ye AS code FROM s5)
SELECT substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST((code >> 15) & 31 AS INT) + 1, 1)
    || substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST((code >> 10) & 31 AS INT) + 1, 1)
    || substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST((code >> 5) & 31 AS INT) + 1, 1)
    || substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST(code & 31 AS INT) + 1, 1)
      AS geohash,
       CAST(SUM(qty_c) AS BIGINT) AS qty_c,
       CAST(COUNT(*) AS BIGINT) AS n_points
FROM c GROUP BY 1
"""


def q_uncovered_points(sf_dir: str):  # exact oracle (NOT EXISTS + rollup)
    """Spatial ANTI-join — probe points contained by NO reference tile CORE
    (rects shrunk to 1/8 half-widths: the high-confidence interior; full
    rects saturate coverage as tiles densify, cores undercover at every
    scale). The coverage-gap audit: the complement of `spatial_join_pairs`,
    ≙ the reference's unmatched-feature set that feeds its OSRM recovery
    loop (`SharedStreetsMatcher/index.js` round-2 input). Fused with its
    rollup: the uncovered set never materializes; per-grid-cell (count,
    min id) partials form map-side and only a grid-sized shuffle runs."""
    pts = conflation.read_points(sf_dir)
    return spatial.uncovered_cell_counts(
        pts, conflation.tiles_ref(sf_dir), "px", "py", "point_id")


SQL_UNCOVERED_POINTS = _CTES + """
, unc AS (
  SELECT p.point_id, p.px, p.py FROM points p
  WHERE NOT EXISTS (
    SELECT 1 FROM tiles t
    WHERE p.px BETWEEN t.cx - t.hw // 8 AND t.cx + t.hw // 8
      AND p.py BETWEEN t.cy - t.hh // 8 AND t.cy + t.hh // 8)
)
SELECT (py // 1024) * 64 + (px // 1024) AS cell_id,
       CAST(COUNT(*) AS BIGINT) AS n_uncovered,
       CAST(MIN(point_id) AS BIGINT) AS min_point_id
FROM unc GROUP BY 1
"""


def _sq8_calibration(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension global (min, span) SQ8 calibration on the 1e6
    fixed-point grid: dim-sized per-batch partials map-side; the driver
    combine touches blocks×dim rows, never the data."""
    emb = _rp(sf_dir, "embeddings", ["embedding"])

    def _mm(batch: pa.Table) -> pa.Table:
        m = ann.quantize_fixed(ann._batch_matrix(batch, "embedding"))
        return pa.table({
            "dim": np.arange(m.shape[1], dtype=np.int64),
            "mn": m.min(axis=0).astype(np.int64),
            "mx": m.max(axis=0).astype(np.int64),
        })

    parts = emb.map_batches(_mm, batch_format="pyarrow", batch_size=8192).to_pandas()
    g = parts.groupby("dim", sort=True).agg(mn=("mn", "min"), mx=("mx", "max"))
    mn = g["mn"].to_numpy(np.int64)
    span = np.maximum(g["mx"].to_numpy(np.int64) - mn, 1)
    return mn, span


def q_embedding_quantize_int8(sf_dir: str):  # exact oracle (integer quantizer)
    """INT8 SCALAR QUANTIZATION of the embedding column — the
    compress-the-vector-store primitive (FAISS SQ8): per-dimension global
    [min, max] calibration, 8-bit codes ``(v−mn)·255 // span``, integer
    dequantization, and per-vector exact reconstruction error. Two passes:
    calibration reduces to dim-sized partials map-side (the driver combine
    touches blocks×dim rows, never the data); encoding is map-only with the
    64-entry calibration table shipped in the task closure. All arithmetic
    is int64 on the 1e6 fixed-point grid, so engine and oracle agree
    bit-for-bit."""
    emb = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    mn, span = _sq8_calibration(sf_dir)

    def _encode(batch: pa.Table) -> pa.Table:
        m = ann.quantize_fixed(ann._batch_matrix(batch, "embedding"))
        code = ((m - mn[None, :]) * 255) // span[None, :]
        dq = mn[None, :] + (code * span[None, :]) // 255
        err = m - dq
        return pa.table({
            "vec_id": batch["vec_id"].cast(pa.int64()),
            "code_sum": code.sum(axis=1).astype(np.int64),
            "sse": (err * err).sum(axis=1).astype(np.int64),
            "max_err": np.abs(err).max(axis=1).astype(np.int64),
        })

    return emb.map_batches(_encode, batch_format="pyarrow", batch_size=8192)


SQL_EMBEDDING_QUANTIZE = f"""
WITH e AS ({_SQL_EMB_FIXED.format(src='embeddings')}),
q AS (
  SELECT vec_id, i - 1 AS dim, qv[i] AS vq
  FROM e, (SELECT unnest(range(1, (SELECT len(qv) FROM e LIMIT 1) + 1)) AS i)
),
mm AS (
  SELECT dim, MIN(vq) AS mn, GREATEST(MAX(vq) - MIN(vq), 1) AS span
  FROM q GROUP BY dim
),
k AS (
  SELECT vec_id, ((vq - mn) * 255) // span AS code,
         vq - (mn + ((((vq - mn) * 255) // span) * span) // 255) AS err
  FROM q JOIN mm USING (dim)
)
SELECT vec_id, CAST(SUM(code) AS BIGINT) AS code_sum,
       CAST(SUM(err * err) AS BIGINT) AS sse,
       CAST(MAX(ABS(err)) AS BIGINT) AS max_err
FROM k GROUP BY vec_id
"""


def q_ann_sq8_topk(sf_dir: str):  # exact oracle (integer SQ8 + L2 ranking)
    """Asymmetric SQ8 top-k search (`ann.sq8_topk`) — the scalar-quantized
    sibling of `ann_pq_adc`: database vectors ride as 8-bit codes (4× memory
    cut), queries stay full fixed-point precision, ranking is EXACT integer
    L2² against the dequantized grid. Composes the `embedding_quantize_int8`
    calibration; every routing/ranking decision is int64 so the oracle is
    bit-exact."""
    emb = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    mn, span = _sq8_calibration(sf_dir)
    qtab = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"],
                         filters=[("vec_id", "<", 8)])
    qtab = pa.table({"query_id": qtab["vec_id"], "embedding": qtab["embedding"]})
    return ann.sq8_topk(emb, ray.put(qtab), mn, span, k=5)


SQL_ANN_SQ8_TOPK = f"""
WITH e AS ({_SQL_EMB_FIXED.format(src='embeddings')}),
q AS (
  SELECT vec_id, i - 1 AS dim, qv[i] AS vq
  FROM e, (SELECT unnest(range(1, (SELECT len(qv) FROM e LIMIT 1) + 1)) AS i)
),
mm AS (
  SELECT dim, MIN(vq) AS mn, GREATEST(MAX(vq) - MIN(vq), 1) AS span
  FROM q GROUP BY dim
),
dq AS (
  SELECT vec_id, q.dim,
         mn + ((((vq - mn) * 255) // span) * span) // 255 AS dv
  FROM q JOIN mm USING (dim)
),
qq AS (SELECT vec_id AS query_id, dim, vq FROM q WHERE vec_id < 8),
d AS (
  SELECT qq.query_id, dq.vec_id,
         CAST(SUM((qq.vq - dq.dv) * (qq.vq - dq.dv)) AS BIGINT) AS d2
  FROM qq JOIN dq ON qq.dim = dq.dim AND dq.vec_id <> qq.query_id
  GROUP BY 1, 2
)
SELECT query_id, vec_id, d2, d2_rank FROM (
  SELECT query_id, vec_id, d2,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d2, vec_id) AS d2_rank
  FROM d
) WHERE d2_rank <= 5
"""


def q_events_cusum(sf_dir: str):  # exact oracle (cumsum window + arg-min)
    """CUSUM CHANGE-POINT SCAN — the classic drift detector: per user, the
    running sum of deviations from the (floor) per-user mean, reported as
    the maximum |CUSUM| and the FIRST 1-based index attaining it (the
    estimated change point). All integer (values quantized to cents, mean
    floored), so the window-function oracle hashes exactly. One
    user-bucketed shuffle; cumsum/argmax are vectorized per bucket."""
    ev = _rp(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def _pre(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"].cast(pa.int64()),
            "us": batch["ts"].cast(pa.int64()),
            "event_id": batch["event_id"].cast(pa.int64()),
            "v_c": cents(batch["value"].to_numpy(zero_copy_only=False)),
        })

    prep = ev.map_batches(_pre, batch_format="pyarrow", batch_size=8192)

    def _scan(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["user_id", "us", "event_id"], kind="mergesort")
        grp = d.groupby("user_id", sort=False)
        cs = grp["v_c"].cumsum().to_numpy(np.int64)
        tot = grp["v_c"].transform("sum").to_numpy(np.int64)
        n = grp["v_c"].transform("size").to_numpy(np.int64)
        rn = (grp.cumcount() + 1).to_numpy(np.int64)
        a = np.abs(cs - rn * (tot // n))
        df2 = pd.DataFrame({"user_id": d["user_id"].to_numpy(np.int64),
                            "rn": rn, "a": a, "n": n})
        mx = df2.groupby("user_id", sort=False)["a"].transform("max")
        hit = df2[df2["a"] == mx]
        res = hit.groupby("user_id", sort=True).agg(
            n_events=("n", "first"), max_abs_cusum=("a", "first"),
            argmax_idx=("rn", "min")).reset_index()
        return res.astype(np.int64)

    return rel.bucketed_groups(prep, ["user_id"], _scan,
                               est_rows=_nrows(sf_dir, "events"))


SQL_EVENTS_CUSUM = """
WITH ec AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v_c
  FROM events
),
w AS (
  SELECT user_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn,
         SUM(v_c) OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS UNBOUNDED PRECEDING) AS cs
  FROM ec
),
t AS (SELECT user_id, SUM(v_c) AS s, COUNT(*) AS n FROM ec GROUP BY 1),
c AS (
  SELECT w.user_id, rn, ABS(cs - rn * (s // n)) AS a, n
  FROM w JOIN t USING (user_id)
),
m AS (SELECT user_id, MAX(a) AS mx FROM c GROUP BY 1)
SELECT c.user_id, CAST(MIN(c.n) AS BIGINT) AS n_events,
       CAST(m.mx AS BIGINT) AS max_abs_cusum,
       CAST(MIN(c.rn) AS BIGINT) AS argmax_idx
FROM c JOIN m ON c.user_id = m.user_id AND c.a = m.mx
GROUP BY c.user_id, m.mx
"""


def q_part_demand_holt(sf_dir: str):  # exact oracle (recursive-CTE replay)
    """HOLT'S LINEAR-TREND FORECAST per part — the demand-planning rollup:
    monthly (30-day-bucket) shipped-quantity series per part on a DENSE
    global month grid (missing months are true zeros), then the level/trend
    recurrence with α=β=1/4 in floor arithmetic:

        l_t = ⌊(v_t + 3·(l+b)) / 4⌋ ,  b_t = ⌊(l_t − l + 3·b) / 4⌋

    (÷4 is exact in IEEE doubles, so DuckDB's FLOOR(x/4.0) ≡ numpy's x//4
    for |x| < 2^53 — negatives included, where DuckDB's integer `//`
    truncates instead). The month-bucket rollup is one bounded shuffle; the
    sequential replay is per-part but VECTORIZED ACROSS PARTS inside each
    bucket (a T-step loop of array ops, T ≈ #months). Month bounds come
    from the parquet FOOTER stats — a metadata-only read, the engine-side
    analog of partition pruning. The fourth stateful sequential-replay op
    (EWMA, rate-limit, trip-tracker, Holt)."""
    MO_US = 2_592_000_000_000  # 30 days in µs

    pf = pq.ParquetFile(f"{sf_dir}/lineitem.parquet")
    idx = pf.schema_arrow.get_field_index("l_shipdate")
    mins, maxs = [], []
    for rg in range(pf.metadata.num_row_groups):
        st = pf.metadata.row_group(rg).column(idx).statistics
        mins.append(st.min.timestamp() if hasattr(st.min, "timestamp") else st.min)
        maxs.append(st.max.timestamp() if hasattr(st.max, "timestamp") else st.max)
    t0 = int(min(mins) * 1_000_000) // MO_US
    t1 = int(max(maxs) * 1_000_000) // MO_US
    T = t1 - t0 + 1

    li = _rp(sf_dir, "lineitem", ["l_partkey", "l_shipdate", "l_quantity"])

    def _pre(batch: pa.Table) -> pa.Table:
        us = batch["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "l_partkey": batch["l_partkey"].cast(pa.int64()),
            "mo": us // MO_US - t0,
            "qty_c": cents(batch["l_quantity"].to_numpy(zero_copy_only=False)),
        })

    prep = li.map_batches(_pre, batch_format="pyarrow", batch_size=8192)
    sums = rel.partial_groupby_sum(prep, ["l_partkey", "mo"], ["qty_c"],
                                   est_rows=_nrows(sf_dir, "lineitem"))

    def _holt(g: pd.DataFrame) -> pd.DataFrame:
        keys, inv = np.unique(g["l_partkey"].to_numpy(np.int64),
                              return_inverse=True)
        v = np.zeros((len(keys), T), dtype=np.int64)
        v[inv, g["mo"].to_numpy(np.int64)] = g["qty_c"].to_numpy(np.int64)
        lvl = v[:, 0].copy()
        b = np.zeros(len(keys), dtype=np.int64)
        for t in range(1, T):
            s = lvl + b
            lvl2 = (v[:, t] + 3 * s) // 4
            b = (lvl2 - lvl + 3 * b) // 4
            lvl = lvl2
        return pd.DataFrame({"l_partkey": keys, "level_c": lvl,
                             "trend_c": b, "forecast_c": lvl + b})

    return rel.bucketed_groups(sums, ["l_partkey"], _holt)


SQL_PART_DEMAND_HOLT = """
WITH RECURSIVE b AS (
  SELECT MIN(epoch_us(l_shipdate)) // 2592000000000 AS t0,
         MAX(epoch_us(l_shipdate)) // 2592000000000 AS t1
  FROM lineitem
),
s AS (
  SELECT l_partkey,
         epoch_us(l_shipdate) // 2592000000000 - (SELECT t0 FROM b) AS mo,
         SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS v
  FROM lineitem GROUP BY 1, 2
),
grid AS (
  SELECT p.l_partkey, t.t, COALESCE(s.v, 0) AS v
  FROM (SELECT DISTINCT l_partkey FROM lineitem) p
  CROSS JOIN (SELECT unnest(range((SELECT t1 - t0 + 1 FROM b))) AS t) t
  LEFT JOIN s ON s.l_partkey = p.l_partkey AND s.mo = t.t
),
h AS (
  SELECT l_partkey, 0 AS t, v AS l, CAST(0 AS BIGINT) AS tr
  FROM grid WHERE t = 0
  UNION ALL
  SELECT g.l_partkey, h.t + 1,
         CAST(FLOOR((g.v + 3 * (h.l + h.tr)) / 4.0) AS BIGINT),
         CAST(FLOOR((CAST(FLOOR((g.v + 3 * (h.l + h.tr)) / 4.0) AS BIGINT)
                     - h.l + 3 * h.tr) / 4.0) AS BIGINT)
  FROM h JOIN grid g ON g.l_partkey = h.l_partkey AND g.t = h.t + 1
)
SELECT l_partkey, CAST(l AS BIGINT) AS level_c, CAST(tr AS BIGINT) AS trend_c,
       CAST(l + tr AS BIGINT) AS forecast_c
FROM h WHERE t = (SELECT t1 - t0 FROM b)
"""


def q_revenue_cube(sf_dir: str):  # exact oracle (GROUP BY CUBE)
    """Full CUBE over (returnflag, linestatus, ship year) — all 8 grouping
    sets, generalizing `revenue_rollup`'s hierarchy with the same
    partial-REUSE plan a 100 TB cube demands: the finest (flag, status,
    year) aggregate is computed ONCE from the fact table (one bounded
    shuffle); every coarser grouping set re-aggregates that groups-sized
    table driver-side, never rescanning the input. Sentinels: 'ALL' for
    rolled-up strings, -1 for the rolled-up year."""
    li = _rp(sf_dir, "lineitem",
             ["l_returnflag", "l_linestatus", "l_shipdate",
              "l_extendedprice", "l_discount"])

    def _rev(batch: pa.Table) -> pa.Table:
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        us = batch["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        # exact year from µs: days since epoch -> civil year (vectorized)
        days = us // 86_400_000_000
        yr = (1970 + (days * 4 + 2) // 1461).astype(np.int64)  # valid 1901-2099
        return pa.table({"l_returnflag": batch["l_returnflag"],
                         "l_linestatus": batch["l_linestatus"],
                         "ship_year": yr,
                         "revenue_c": cents(price * (1.0 - disc))})

    mapped = li.map_batches(_rev, batch_format="pyarrow", batch_size=8192)
    base = rel.partial_groupby_sum(
        mapped, ["l_returnflag", "l_linestatus", "ship_year"],
        ["revenue_c"], count_as="n_rows", est_rows=_nrows(sf_dir, "lineitem"))
    base_pd = base.to_pandas()  # groups-sized: |flags|·|statuses|·|years|

    dims = ["l_returnflag", "l_linestatus", "ship_year"]
    sentinel = {"l_returnflag": "ALL", "l_linestatus": "ALL", "ship_year": -1}
    outs = []
    for mask in range(8):  # bit i set -> dim i kept
        keep = [d for i, d in enumerate(dims) if mask & (1 << i)]
        if keep:
            g = base_pd.groupby(keep, as_index=False, sort=False).agg(
                {"revenue_c": "sum", "n_rows": "sum"})
        else:
            g = pd.DataFrame({"revenue_c": [base_pd["revenue_c"].sum()],
                              "n_rows": [base_pd["n_rows"].sum()]})
        for d in dims:
            if d not in keep:
                g[d] = sentinel[d]
        outs.append(g[dims + ["revenue_c", "n_rows"]])
    out = pd.concat(outs, ignore_index=True)
    out["ship_year"] = out["ship_year"].astype(np.int64)
    out["revenue_c"] = out["revenue_c"].astype(np.int64)
    out["n_rows"] = out["n_rows"].astype(np.int64)
    return ray.data.from_pandas(out)


SQL_REVENUE_CUBE = """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       CAST(COALESCE(EXTRACT(year FROM l_shipdate), -1) AS BIGINT) AS ship_year,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_c,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus, EXTRACT(year FROM l_shipdate))
"""


def q_grid_slope_aspect(sf_dir: str):  # exact oracle (4-way neighbor joins)
    """Raster GRADIENT (slope/aspect) over the probe-point density grid —
    the DEM-processing pass (`spatial.grid_slope_aspect`): central
    differences with signed neighbor fan-out, exact slope² and a 9-class
    integer aspect code."""
    pts = conflation.read_points(sf_dir)
    return spatial.grid_slope_aspect(pts, "px", "py", cell=1024,
                                     est_rows=_nrows(sf_dir, "lineitem"))


SQL_GRID_SLOPE_ASPECT = _CTES + """
, cells AS (
  SELECT px // 1024 AS cx, py // 1024 AS cy, CAST(COUNT(*) AS BIGINT) AS v
  FROM points GROUP BY 1, 2
)
SELECT b.cx, b.cy, b.v,
       COALESCE(e.v, 0) - COALESCE(w.v, 0) AS dx,
       COALESCE(n.v, 0) - COALESCE(s.v, 0) AS dy,
       (COALESCE(e.v, 0) - COALESCE(w.v, 0)) * (COALESCE(e.v, 0) - COALESCE(w.v, 0))
     + (COALESCE(n.v, 0) - COALESCE(s.v, 0)) * (COALESCE(n.v, 0) - COALESCE(s.v, 0))
         AS slope2,
       3 * (SIGN(COALESCE(e.v, 0) - COALESCE(w.v, 0)) + 1)
         + SIGN(COALESCE(n.v, 0) - COALESCE(s.v, 0)) + 1 AS aspect_class
FROM cells b
LEFT JOIN cells e ON e.cx = b.cx + 1 AND e.cy = b.cy
LEFT JOIN cells w ON w.cx = b.cx - 1 AND w.cy = b.cy
LEFT JOIN cells n ON n.cx = b.cx AND n.cy = b.cy + 1
LEFT JOIN cells s ON s.cx = b.cx AND s.cy = b.cy - 1
"""


def q_traj_comovement(sf_dir: str):  # exact oracle (slot self-join + LEAST)
    """CO-MOVEMENT / convoy detection — pairs of trajectories whose sparser
    member is FULLY co-located with the other: shared distinct (space cell,
    time window) slots == min(slot count a, slot count b) (Jeung et al.'s
    convoy primitive with a containment threshold — absolute counts scale
    with trajectory length, so a fixed constant cannot separate convoys
    across data scales; full containment is scale-invariant and integer).
    Trajectory bands are folded out (x mod 100000) so cells compare
    positions WITHIN the route; slot = 64-cell × per-step window. Plan: one
    slot-bucketed shuffle deduplicates (traj, slot) presence, fans out
    in-slot pairs, AND emits per-traj slot-count partials (tagged
    traj_b = −1) in the same pass; pair counts pre-aggregate before the
    pair-sized combine (the `orders_basket_lift` shape); the 50-row count
    table broadcasts into the final filter. Per-slot occupancy is bounded
    by the trajectory count; a production corpus would cap and log
    oversized slots like the LSH buckets do."""
    pts = _traj_xy(sf_dir)

    def _slots(batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy(zero_copy_only=False) % 100000
        y = batch["y"].to_numpy(zero_copy_only=False)
        return pa.table({
            "slot_x": x // 64, "slot_y": y // 64, "w": batch["seq"],
            "traj_id": batch["traj_id"],
        })

    slots = pts.map_batches(_slots, batch_format="pyarrow", batch_size=8192)

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["slot_x", "slot_y", "w", "traj_id"])
        cnts = d.groupby("traj_id", as_index=False).size()
        outs = [pd.DataFrame({"traj_a": cnts["traj_id"].to_numpy(np.int64),
                              "traj_b": np.int64(-1),
                              "n_shared": cnts["size"].to_numpy(np.int64)})]
        for _, grp in d.groupby(["slot_x", "slot_y", "w"], sort=False):
            t = np.sort(grp["traj_id"].to_numpy(np.int64))
            if len(t) < 2:
                continue
            i, j = np.triu_indices(len(t), k=1)
            outs.append(pd.DataFrame({"traj_a": t[i], "traj_b": t[j],
                                      "n_shared": np.int64(1)}))
        p = pd.concat(outs, ignore_index=True)
        return (p.groupby(["traj_a", "traj_b"], as_index=False)["n_shared"]
                 .sum().astype(np.int64))

    pair_parts = rel.bucketed_groups(slots, ["slot_x", "slot_y", "w"], _pairs,
                                     est_rows=_nrows(sf_dir, "events"))
    summed = rel.partial_groupby_sum(pair_parts, ["traj_a", "traj_b"],
                                     ["n_shared"])

    # pair-sized result (≤ |trajs|² rows): one bounded driver materialize
    # finishes the containment filter without re-executing the pipeline
    sp = summed.to_pandas()
    cnt = sp[sp["traj_b"] == -1]
    n_of = dict(zip(cnt["traj_a"].astype(np.int64),
                    cnt["n_shared"].astype(np.int64)))
    p = sp[sp["traj_b"] != -1].copy()
    na = p["traj_a"].map(n_of).to_numpy(np.int64)
    nb = p["traj_b"].map(n_of).to_numpy(np.int64)
    p["min_slots"] = np.minimum(na, nb)
    p = p[p["n_shared"].to_numpy(np.int64) >= p["min_slots"].to_numpy(np.int64)]
    return p.reset_index(drop=True).astype(np.int64)


SQL_TRAJ_COMOVEMENT = f"""
WITH xy AS ({_SQL_TRAJ_XY}),
slots AS (
  SELECT DISTINCT (x % 100000) // 64 AS slot_x, y // 64 AS slot_y,
         seq AS w, traj_id
  FROM xy
),
cnt AS (SELECT traj_id, CAST(COUNT(*) AS BIGINT) AS n FROM slots GROUP BY 1)
SELECT traj_a, traj_b, n_shared, min_slots FROM (
  SELECT a.traj_id AS traj_a, b.traj_id AS traj_b,
         CAST(COUNT(*) AS BIGINT) AS n_shared,
         LEAST(ca.n, cb.n) AS min_slots
  FROM slots a JOIN slots b
    ON a.slot_x = b.slot_x AND a.slot_y = b.slot_y AND a.w = b.w
   AND a.traj_id < b.traj_id
  JOIN cnt ca ON ca.traj_id = a.traj_id
  JOIN cnt cb ON cb.traj_id = b.traj_id
  GROUP BY 1, 2, ca.n, cb.n
) WHERE n_shared >= min_slots
"""


def q_events_gap_fill(sf_dir: str):  # exact oracle (LOCF replayed by window fn)
    """Dense-grid gap filling with last-observation-carried-forward
    (``windows.gap_fill_locf``) — the time-series repair pass of a feature
    store: per user the sparse daily value stream becomes a dense series
    over the user's own [first_day, last_day] span; each present day takes
    its LAST event's value (by ts, event_id), absent days carry the
    previous day forward (``is_filled`` = 1). The per-(user, day)
    "last row wins" reduction combines map-side, so the one shuffle moves
    at most a row per (user, day) per batch."""
    from ..stages.windows import gap_fill_locf

    ev = _rp(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def _pre(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64())
        return pa.table({
            "user_id": batch["user_id"].cast(pa.int64()),
            "day": pc.divide(us, 86_400_000_000),
            "us": us,
            "event_id": batch["event_id"].cast(pa.int64()),
            "v": pa.array(cents(batch["value"].to_numpy(zero_copy_only=False))),
        })

    prep = ev.map_batches(_pre, batch_format="pyarrow", batch_size=8192)
    return gap_fill_locf(prep, "user_id", "day", ["us", "event_id"], "v")


SQL_EVENTS_GAP_FILL = """
WITH e AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us, event_id,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v
  FROM events
),
lastv AS (
  SELECT user_id, us // 86400000000 AS day, v
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, us // 86400000000
                                     ORDER BY us DESC, event_id DESC) AS rn
        FROM e)
  WHERE rn = 1
),
span AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM lastv GROUP BY 1),
grid AS (SELECT user_id, unnest(range(d0, d1 + 1)) AS day FROM span),
j AS (
  SELECT g.user_id, g.day, l.v
  FROM grid g LEFT JOIN lastv l ON l.user_id = g.user_id AND l.day = g.day
)
SELECT user_id, CAST(day AS BIGINT) AS day,
       last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
                                        ROWS UNBOUNDED PRECEDING) AS v_c,
       CAST(v IS NULL AS BIGINT) AS is_filled
FROM j
"""


def q_events_kmv_distinct(sf_dir: str):  # exact oracle (HUGEINT estimator)
    """K-Minimum-Values distinct sketch per event type
    (``relational.kmv_distinct``, k=64) — the fourth sketch next to HLL,
    Misra-Gries and Count-Min; the shuffle moves at most k hash rows per
    (type, batch) and the (k-1)·2^64/h_k estimate is exact big-int floor
    on both sides."""
    ev = _rp(sf_dir, "events", ["event_type", "user_id"])
    return rel.kmv_distinct(ev, ["event_type"], "user_id", k=64)


SQL_EVENTS_KMV_DISTINCT = f"""
WITH h AS (
  SELECT event_type, xor(z2, z2 >> 31) AS hh
  FROM (
    SELECT event_type,
           ((xor(z1, z1 >> 27) * 321982955) % {_SQL_M64}
            + ((xor(z1, z1 >> 27) * 2496678331) % 4294967296) * 4294967296)
             % {_SQL_M64} AS z2
    FROM (
      SELECT event_type,
             ((xor(z0, z0 >> 30) * 484763065) % {_SQL_M64}
              + ((xor(z0, z0 >> 30) * 3210233709) % 4294967296) * 4294967296)
               % {_SQL_M64} AS z1
      FROM (
        SELECT event_type,
               (CAST(user_id AS HUGEINT) + CAST(11400714819323198485 AS HUGEINT))
                 % {_SQL_M64} AS z0
        FROM events
      )
    )
  )
),
d AS (SELECT DISTINCT event_type, hh FROM h),
rk AS (SELECT event_type, hh,
              ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hh) AS rn
       FROM d),
n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nd FROM d GROUP BY 1)
SELECT n.event_type,
       CAST(LEAST(n.nd, 64) AS BIGINT) AS n_min_hashes,
       CAST(CASE WHEN n.nd >= 64
                 THEN (CAST(63 AS HUGEINT) << 64) // k.hh
                 ELSE n.nd END AS BIGINT) AS kmv_est
FROM n LEFT JOIN (SELECT event_type, hh FROM rk WHERE rn = 64) k
  ON k.event_type = n.event_type
"""


def q_doc_edit_distance(sf_dir: str):  # exact oracle (DuckDB levenshtein)
    """Edit-distance near-duplicate verification
    (``dedup.edit_distance_pairs``): normalized-prefix blocking (cap 64,
    logged) + EXACT unit-cost Levenshtein <= 16 on the raw text via
    Myers' bit-parallel DP; the length-gap and char-histogram prunes are
    engine-only sound bounds, so the oracle verifies every block pair
    directly with DuckDB's ``levenshtein()``."""
    docs = _rp(sf_dir, "documents", ["doc_id", "text"])
    return dedup.edit_distance_pairs(docs, max_dist=16, prefix=12,
                                     block_cap=64)


SQL_DOC_EDIT_DISTANCE = """
WITH n AS (
  SELECT doc_id, text,
         substr(regexp_replace(
                  translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                            'abcdefghijklmnopqrstuvwxyz'),
                  '[^a-z0-9]+', '', 'g'), 1, 12) AS blk
  FROM documents
),
capped AS (
  SELECT doc_id, text, blk
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY blk ORDER BY doc_id) AS rn
        FROM n)
  WHERE rn <= 64
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist
FROM capped a JOIN capped b ON a.blk = b.blk AND a.doc_id < b.doc_id
WHERE levenshtein(a.text, b.text) <= 16
"""


def q_grid_contours(sf_dir: str):  # exact oracle (4-corner fan-out mirrored)
    """Marching-squares isoline extraction over the probe-point density
    raster (``spatial.marching_squares``): iso-level = ceil-mean of the
    occupied cells, every level-crossing 2x2 corner window emits its 4-bit
    case code (1..14). Hot cells fan out x4; one grid-sized shuffle."""
    pts = conflation.read_points(sf_dir)
    return spatial.marching_squares(pts, "px", "py", cell=1024)


SQL_GRID_CONTOURS = _CTES + """,
cells AS (
  SELECT px // 1024 AS cx, py // 1024 AS cy, COUNT(*) AS v
  FROM points GROUP BY 1, 2
),
t AS (SELECT (SUM(v) + COUNT(*) - 1) // COUNT(*) AS thr FROM cells),
hot AS (SELECT cx, cy FROM cells, t WHERE v >= thr),
wins AS (
  SELECT cx AS wx, cy AS wy, 1 AS b FROM hot
  UNION ALL SELECT cx - 1, cy, 2 FROM hot
  UNION ALL SELECT cx, cy - 1, 4 FROM hot
  UNION ALL SELECT cx - 1, cy - 1, 8 FROM hot
)
SELECT wx, wy, CAST(SUM(b) AS BIGINT) AS case_code
FROM wins GROUP BY 1, 2 HAVING SUM(b) < 15
"""


def q_doc_langid_confusion(sf_dir: str):  # exact oracle (langid rule mirrored)
    """Language-ID CONFUSION MATRIX — the model-evaluation loop applied to
    the heuristic classifier (the text sibling of ``ann_recall``): predicted
    vs fixture-true language, counted per (true, pred) pair. Prediction is
    the same vectorized kernel ``doc_langid`` gates; the count shuffle is
    (languages)²-bounded."""
    from ..functions import text as tx

    docs = _rp(sf_dir, "documents", ["doc_id", "text", "lang"])

    def _pred(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        return pa.table({
            "lang_true": batch["lang"],
            "lang_pred": pa.array(list(tx.lang_id(texts)), type=pa.string()),
        })

    mapped = docs.map_batches(_pred, batch_format="pyarrow", batch_size=4096)
    return rel.partial_groupby_sum(mapped, ["lang_true", "lang_pred"], [],
                                   count_as="n_docs")


SQL_DOC_LANGID_CONFUSION = """
WITH pred AS (
__LANGID__
)
SELECT d.lang AS lang_true, p.lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents d JOIN pred p USING (doc_id)
GROUP BY 1, 2
"""


def q_lineitem_group_median(sf_dir: str):  # exact oracle (order statistics)
    """EXACT grouped median (``relational.group_median2``, doubled form so
    even-n averages stay integer): per (returnflag, linestatus), the two
    middle order statistics of the extended-price cents — the holistic
    aggregate that genuinely needs the group's full multiset (the sketch
    sibling is ``value_quantiles``)."""
    li = _rp(sf_dir, "lineitem",
             ["l_returnflag", "l_linestatus", "l_extendedprice"])

    def _pre(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "vc": pa.array(cents(
                batch["l_extendedprice"].to_numpy(zero_copy_only=False))),
        })

    prep = li.map_batches(_pre, batch_format="pyarrow", batch_size=16384)
    return rel.group_median2(prep, ["l_returnflag", "l_linestatus"], "vc",
                             est_rows=_nrows(sf_dir, "lineitem"))


SQL_LINEITEM_GROUP_MEDIAN = """
WITH v AS (
  SELECT l_returnflag, l_linestatus,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS vc
  FROM lineitem
),
r AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag, l_linestatus
                            ORDER BY vc) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag, l_linestatus) AS n
  FROM v
)
SELECT l_returnflag, l_linestatus, CAST(MAX(n) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN vc ELSE 0 END)
            + SUM(CASE WHEN rn = (n + 2) // 2 THEN vc ELSE 0 END)
            AS BIGINT) AS med2
FROM r GROUP BY 1, 2
"""


def q_tile_union_area(sf_dir: str):  # exact oracle (strip sweep mirrored)
    """EXACT union area of the overlapping tile-rect layer
    (``spatial.rect_union_area``): per-cell strip-sweep decomposition —
    the 2D coverage-area primitive next to the 1D
    ``user_interval_coverage`` sweep and the clipped-SUM (not union) of
    ``tile_coverage_grid``. Fan-out shuffle bounded at rects × ≤4 cells."""
    part = _rp(sf_dir, "part", ["p_partkey", "p_size"])

    def _rects(batch: pa.Table) -> pd.DataFrame:
        t = td.tiles_batch(batch)
        cx = t["cx"].to_numpy()
        cy = t["cy"].to_numpy()
        hw = t["hw"].to_numpy()
        hh = t["hh"].to_numpy()
        x0 = np.maximum(cx - hw, 0)
        x1 = np.minimum(cx + hw, 65536)
        y0 = np.maximum(cy - hh, 0)
        y1 = np.minimum(cy + hh, 65536)
        keep = (x1 > x0) & (y1 > y0)
        return pd.DataFrame({"x0": x0[keep], "x1": x1[keep],
                             "y0": y0[keep], "y1": y1[keep]})

    rects = part.map_batches(_rects, batch_format="pyarrow", batch_size=8192)
    return spatial.rect_union_area(rects, cell=4096,
                                   est_rows=_nrows(sf_dir, "part"))


SQL_TILE_UNION_AREA = f"""
WITH tiles AS ({td.TILES_SQL}),
rects AS (
  SELECT GREATEST(cx - hw, 0) AS x0, LEAST(cx + hw, 65536) AS x1,
         GREATEST(cy - hh, 0) AS y0, LEAST(cy + hh, 65536) AS y1
  FROM tiles
  WHERE LEAST(cx + hw, 65536) > GREATEST(cx - hw, 0)
    AND LEAST(cy + hh, 65536) > GREATEST(cy - hh, 0)
),
cr AS (
  SELECT gx.g AS gx, gy.g AS gy,
         GREATEST(r.x0, gx.g * 4096) AS x0, LEAST(r.x1, (gx.g + 1) * 4096) AS x1,
         GREATEST(r.y0, gy.g * 4096) AS y0, LEAST(r.y1, (gy.g + 1) * 4096) AS y1
  FROM rects r,
       (SELECT unnest(range(16)) AS g) gx,
       (SELECT unnest(range(16)) AS g) gy
  WHERE r.x0 < (gx.g + 1) * 4096 AND r.x1 > gx.g * 4096
    AND r.y0 < (gy.g + 1) * 4096 AND r.y1 > gy.g * 4096
),
xs AS (
  SELECT DISTINCT gx, gy, x FROM (
    SELECT gx, gy, x0 AS x FROM cr UNION ALL SELECT gx, gy, x1 FROM cr)
),
strips AS (
  SELECT gx, gy, x AS sx0,
         LEAD(x) OVER (PARTITION BY gx, gy ORDER BY x) AS sx1
  FROM xs
),
iv AS (
  SELECT s.gx, s.gy, s.sx0, s.sx1, r.y0, r.y1
  FROM strips s JOIN cr r
    ON r.gx = s.gx AND r.gy = s.gy AND r.x0 < s.sx1 AND r.x1 > s.sx0
  WHERE s.sx1 IS NOT NULL
),
m AS (
  SELECT *,
         MAX(y1) OVER (PARTITION BY gx, gy, sx0 ORDER BY y0, y1
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM iv
),
isl AS (
  SELECT *,
         SUM(CASE WHEN prev_max IS NULL OR y0 > prev_max THEN 1 ELSE 0 END)
           OVER (PARTITION BY gx, gy, sx0 ORDER BY y0, y1
                 ROWS UNBOUNDED PRECEDING) AS island
  FROM m
),
ilen AS (
  SELECT gx, gy, sx0, sx1, island, MAX(y1) - MIN(y0) AS len
  FROM isl GROUP BY 1, 2, 3, 4, 5
)
SELECT gx, gy, CAST(SUM((sx1 - sx0) * len) AS BIGINT) AS covered_area
FROM ilen GROUP BY 1, 2
"""


def q_image_components(sf_dir: str):  # exact oracle (column-parity closed form)
    """Blob labeling through the decode path (``media.ImageComponents``):
    threshold = R-channel PARITY (the gradient fixture then yields several
    full-height stripes per image), 4-connected components via the general
    run-merge union-find (pytest fuzzes it against BFS on random 2D
    masks). The oracle replays the per-column R value — jpeg dequant
    included — and counts odd-column islands."""
    docs = _rp(sf_dir, "documents", ["doc_id"])

    synth = docs.map_batches(_image_fixture_synth, batch_format="pyarrow", batch_size=512)
    return mstage.image_components(synth, batch_size=512)


SQL_IMAGE_COMPONENTS = """
WITH im AS (
  SELECT doc_id AS image_id,
         16 + (doc_id % 4) * 8 AS w, 12 + (doc_id % 3) * 6 AS h,
         doc_id % 3 AS fi, (doc_id * 7) % 200 AS br
  FROM documents
),
cols AS (
  SELECT image_id, h, j,
         CASE WHEN fi = 2
              THEN ((br + (j * 55) // (w - 1)) // 4) * 4
                   + ((br + (j * 55) // (w - 1)) // 4) // 16
              ELSE br + (j * 55) // (w - 1) END AS v
  FROM im, (SELECT unnest(range(40)) AS j) js WHERE j < w
),
odd AS (SELECT image_id, h, j FROM cols WHERE v % 2 = 1),
runs AS (
  SELECT image_id, h,
         j - ROW_NUMBER() OVER (PARTITION BY image_id ORDER BY j) AS grp
  FROM odd
),
comp AS (
  SELECT image_id, MIN(h) AS h, COUNT(*) AS run_w
  FROM runs GROUP BY image_id, grp
),
agg AS (
  SELECT image_id, CAST(COUNT(*) AS BIGINT) AS n_components,
         CAST(MAX(run_w) * MIN(h) AS BIGINT) AS largest_area
  FROM comp GROUP BY image_id
)
SELECT i.image_id,
       COALESCE(a.n_components, 0) AS n_components,
       COALESCE(a.largest_area, 0) AS largest_area
FROM im i LEFT JOIN agg a USING (image_id)
"""


def q_embedding_hard_negatives(sf_dir: str):  # exact oracle (label-masked cosine)
    """Hard-negative mining for contrastive training
    (``ann.hard_negative_topk``): per query vector, the 5 most
    cosine-similar vectors with a DIFFERENT label — the near-miss
    negatives a retrieval loss learns most from. Broadcast query matrix +
    labels; the merge moves ≤ k rows per (query, batch)."""
    emb = _rp(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    qtab = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"],
                         filters=[("vec_id", "<", 8)])
    qtab = pa.table({"query_id": qtab["vec_id"],
                     "embedding": qtab["embedding"],
                     "label": qtab["label"]})
    out = ann.hard_negative_topk(emb, ray.put(qtab), k=5)
    return out.map_batches(_sim_q4, batch_format="pyarrow")


SQL_EMBEDDING_HARD_NEGATIVES = """
WITH q AS (SELECT vec_id AS query_id, label AS qlabel,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
           FROM embeddings WHERE vec_id < 8),
sims AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.qe,
             list_transform(e.embedding, x -> CAST(x AS DOUBLE))) AS sim
  FROM q CROSS JOIN embeddings e
  WHERE e.label <> q.qlabel
)
SELECT query_id, vec_id, sim_rank,
       CAST(FLOOR(sim * 10000 + 0.5) AS BIGINT) AS sim_q4 FROM (
  SELECT query_id, vec_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, vec_id) AS sim_rank
  FROM sims
) WHERE sim_rank <= 5
"""


def q_shape_dtw(sf_dir: str):  # exact oracle (anti-diagonal recursive CTE)
    """Dynamic-time-warping curve similarity between the two halves of each
    shape (``segments.shape_dtw_halves``) — the accumulating third scorer
    next to Fréchet (max) and Hausdorff (max-of-min), completing the
    curve-scoring family of the reference (``frechet.js:8-35``). Integer
    by construction; the oracle replays the same 24×24 DP by
    anti-diagonals in one recursive CTE."""
    from ..stages import segments

    return segments.shape_dtw_halves(_event_shapes(sf_dir))


SQL_SHAPE_DTW = "WITH RECURSIVE " + _SQL_SHAPE_PTS + """,
halves AS (
  SELECT p.user_id,
         list(p.x ORDER BY p.gi) FILTER (WHERE p.gi <= n.n // 2) AS ax,
         list(p.y ORDER BY p.gi) FILTER (WHERE p.gi <= n.n // 2) AS ay,
         list(p.x ORDER BY p.gi) FILTER (WHERE p.gi > n.n // 2) AS bx,
         list(p.y ORDER BY p.gi) FILTER (WHERE p.gi > n.n // 2) AS "by"
  FROM pts p JOIN nn n USING (user_id) WHERE n.n >= 4
  GROUP BY p.user_id
),
picked AS MATERIALIZED (  -- stride_pick to 24 vertices per half
  SELECT user_id,
         [ax[1 + _j * (len(ax) - 1) // 23] FOR _j IN range(24)] AS pax,
         [ay[1 + _j * (len(ay) - 1) // 23] FOR _j IN range(24)] AS pay,
         [bx[1 + _j * (len(bx) - 1) // 23] FOR _j IN range(24)] AS pbx,
         ["by"[1 + _j * (len("by") - 1) // 23] FOR _j IN range(24)] AS pby
  FROM halves
),
dtw AS (  -- DTW DP by anti-diagonals: cell = d + min(left, up, diag)
  SELECT user_id, 0 AS k,
         [(pax[1] - pbx[1]) * (pax[1] - pbx[1])
          + (pay[1] - pby[1]) * (pay[1] - pby[1])] AS cur,
         CAST(NULL AS BIGINT[]) AS prev,
         pax, pay, pbx, pby
  FROM picked
  UNION ALL
  SELECT user_id, k + 1,
         [ (pax[_i + 1] - pbx[k + 1 - _i + 1]) * (pax[_i + 1] - pbx[k + 1 - _i + 1])
           + (pay[_i + 1] - pby[k + 1 - _i + 1]) * (pay[_i + 1] - pby[k + 1 - _i + 1])
           + least(
               COALESCE(cur[_i - greatest(0, k - 23) + 1], 1099511627776),
               COALESCE(cur[_i - 1 - greatest(0, k - 23) + 1], 1099511627776),
               COALESCE(prev[_i - 1 - greatest(0, k - 1 - 23) + 1], 1099511627776)
             )
           FOR _i IN range(greatest(0, k + 1 - 23), least(k + 1, 23) + 1) ] AS cur,
         cur AS prev, pax, pay, pbx, pby
  FROM dtw WHERE k < 46
),
best AS (SELECT user_id, cur[1] AS c FROM dtw WHERE k = 46)
SELECT n.user_id,
       CAST(CASE WHEN n.n < 4 THEN -1 ELSE b.c END AS BIGINT) AS dtw_sq
FROM nn n LEFT JOIN best b USING (user_id)
"""


def q_grid_distance_transform(sf_dir: str):  # exact oracle (min over sources)
    """L1 distance transform over the point-density raster
    (``spatial.grid_distance_transform``): dense cells (v ≥ (max+1)//2)
    are sources, every cell of the 64×64 grid gets its city-block distance
    to the nearest source via the exact two-scan chamfer. The oracle
    computes the same field as a brute-force min over all sources."""
    pts = conflation.read_points(sf_dir)
    out = spatial.grid_distance_transform(pts, "px", "py", cell=1024)
    return out


SQL_GRID_DISTANCE_TRANSFORM = _CTES + """,
cells AS (
  SELECT px // 1024 AS cx, py // 1024 AS cy, COUNT(*) AS v
  FROM points GROUP BY 1, 2
),
mx AS (SELECT (MAX(v) + 1) // 2 AS thr FROM cells),
grid AS (
  SELECT gx.i AS cx, gy.i AS cy
  FROM (SELECT unnest(range(64)) AS i) gx, (SELECT unnest(range(64)) AS i) gy
),
fullg AS (
  SELECT g.cx, g.cy, COALESCE(c.v, 0) AS v
  FROM grid g LEFT JOIN cells c USING (cx, cy)
),
src AS (SELECT cx, cy FROM cells, mx WHERE v >= thr),
d AS (
  SELECT f.cx, f.cy, MIN(ABS(f.cx - s.cx) + ABS(f.cy - s.cy)) AS dist_l1
  FROM fullg f CROSS JOIN src s GROUP BY f.cx, f.cy
)
SELECT f.cx, f.cy, CAST(f.v AS BIGINT) AS v,
       f.v >= mx.thr AS is_src, CAST(d.dist_l1 AS BIGINT) AS dist_l1
FROM fullg f JOIN d USING (cx, cy), mx
"""


def q_doc_readability(sf_dir: str):  # exact oracle (regex count mirror)
    """Integer LIX readability scoring (``textops.readability``) — the
    document-quality filter next to the Gopher repetition metrics:
    avg-sentence-length ×1000 plus long-word(≥7) percentage ×1000, all
    floor divisions. Map-only; text never shuffles."""
    docs = _rp(sf_dir, "documents", ["doc_id", "text"])
    return textops.readability(docs)


SQL_DOC_READABILITY = """
WITH c AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(COALESCE(text, '')), '[0-9a-z_]+')) AS n_words,
         len(regexp_extract_all(COALESCE(text, ''), '[.!?]+')) AS n_sentences,
         len(list_filter(regexp_extract_all(lower(COALESCE(text, '')), '[0-9a-z_]+'),
                         w -> length(w) >= 7)) AS n_long
  FROM documents
)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       CAST(n_sentences AS BIGINT) AS n_sentences,
       CAST(n_long AS BIGINT) AS n_long,
       CAST(n_words * 1000 // GREATEST(n_sentences, 1)
            + n_long * 100000 // GREATEST(n_words, 1) AS BIGINT) AS lix_q
FROM c
"""


def q_image_morphology(sf_dir: str):  # exact oracle (column-parity closed form)
    """3×3 binary erosion/dilation pixel counts through the decode path
    (``media.image_morphology``): threshold = R-channel parity over the
    gradient fixture (full-height stripe masks). The kernel is the general
    shifted-window morphology (pytest-fuzzed vs brute force); the oracle
    replays the per-column R value — jpeg dequant included — and collapses
    the full-height structure: eroded = (h−2)·|cols whose 3-col window is
    all-odd|, dilated = h·|cols with ≥1 odd in-bounds neighbor col|."""
    docs = _rp(sf_dir, "documents", ["doc_id"])

    synth = docs.map_batches(_image_fixture_synth, batch_format="pyarrow", batch_size=512)
    return mstage.image_morphology(synth, batch_size=512)


SQL_IMAGE_MORPHOLOGY = """
WITH im AS (
  SELECT doc_id AS image_id,
         16 + (doc_id % 4) * 8 AS w, 12 + (doc_id % 3) * 6 AS h,
         doc_id % 3 AS fi, (doc_id * 7) % 200 AS br
  FROM documents
),
cols AS (
  SELECT image_id, w, h, j,
         CASE WHEN fi = 2
              THEN ((br + (j * 55) // (w - 1)) // 4) * 4
                   + ((br + (j * 55) // (w - 1)) // 4) // 16
              ELSE br + (j * 55) // (w - 1) END % 2 AS m
  FROM im, (SELECT unnest(range(40)) AS j) js WHERE j < w
),
nb AS (
  SELECT image_id, w, h, j, m,
         COALESCE(lag(m) OVER (PARTITION BY image_id ORDER BY j), 0) AS ml,
         COALESCE(lead(m) OVER (PARTITION BY image_id ORDER BY j), 0) AS mr
  FROM cols
)
SELECT image_id,
       CAST(h * SUM(m) AS BIGINT) AS n_mask,
       CAST((h - 2) * SUM(CASE WHEN j >= 1 AND j <= w - 2
                               AND m = 1 AND ml = 1 AND mr = 1
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_eroded,
       CAST(h * SUM(CASE WHEN m = 1 OR ml = 1 OR mr = 1
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_dilated
FROM nb GROUP BY image_id, h
"""


def q_tile_isochrone(sf_dir: str):  # exact oracle (unrolled relax rounds)
    """Weighted multi-source shortest-path COST FIELD over the tile kNN
    graph (``graphrank.sssp_rounds``, 3 Bellman-Ford rounds, edge weight =
    centroid dist²) — the isochrone / nearest-depot-cost pass next to the
    hop-count BFS. Seeds are every 50th tile; exact for all paths ≤ 3
    edges by the fixed-round convention (oracle unrolls MATERIALIZED
    rounds, the ``kcore``/``pagerank`` pattern)."""
    from ..stages.graphrank import sssp_rounds

    knn = q_tile_knn_graph(sf_dir)

    def _edges(t: pa.Table) -> pa.Table:
        s = t["src_tile"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["tile_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t["dist2"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = s != d
        s, d, w = s[m], d[m], w[m]
        return pa.table({"src": np.concatenate([s, d]),
                         "dst": np.concatenate([d, s]),
                         "w": np.concatenate([w, w])})

    edges = knn.map_batches(_edges, batch_format="pyarrow",
                            batch_size=65536).materialize()
    part = _rp(sf_dir, "part", ["p_partkey", "p_size"])

    def _seeds(batch: pa.Table) -> pa.Table:
        t = td.tiles_batch(batch)
        tid = t["tile_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": tid[tid % 50 == 0]})

    seeds = part.map_batches(_seeds, batch_format="pyarrow",
                             batch_size=65536)
    out = sssp_rounds(edges, seeds, rounds=3)
    return out.map_batches(
        lambda t: pa.table({"tile_id": t["node"], "cost": t["cost"]}),
        batch_format="pyarrow", batch_size=65536)


_SQL_ISO_HEAD = f"""
WITH tiles AS ({td.TILES_SQL}),
probes AS (SELECT tile_id AS src_tile, cx AS px, cy AS py
           FROM tiles WHERE tile_id % 10 = 0),
knn AS (
  SELECT src_tile, tile_id, dist2 FROM (
    SELECT p.src_tile, t.tile_id,
           (p.px - t.cx) * (p.px - t.cx)
           + (p.py - t.cy) * (p.py - t.cy) AS dist2,
           ROW_NUMBER() OVER (
             PARTITION BY p.src_tile
             ORDER BY (p.px - t.cx) * (p.px - t.cx)
                    + (p.py - t.cy) * (p.py - t.cy), t.tile_id) AS knn_rank
    FROM probes p CROSS JOIN tiles t
  ) WHERE knn_rank <= 4
),
ed AS MATERIALIZED (
  SELECT src_tile AS s, tile_id AS t, dist2 AS w FROM knn
  WHERE tile_id <> src_tile
  UNION ALL
  SELECT tile_id, src_tile, dist2 FROM knn WHERE tile_id <> src_tile
),
d0 AS (SELECT tile_id AS node, CAST(0 AS BIGINT) AS cost
       FROM tiles WHERE tile_id % 50 = 0)
"""

SQL_TILE_ISOCHRONE = _SQL_ISO_HEAD + "".join(
    f""",
d{r + 1} AS MATERIALIZED (
  SELECT node, MIN(cost) AS cost FROM (
    SELECT node, cost FROM d{r}
    UNION ALL
    SELECT e.t AS node, d{r}.cost + e.w AS cost
    FROM d{r} JOIN ed e ON e.s = d{r}.node
  ) GROUP BY node
)"""
    for r in range(3)
) + """
SELECT node AS tile_id, CAST(cost AS BIGINT) AS cost FROM d3
"""


def q_user_type_gini(sf_dir: str):  # exact oracle (integer impurity)
    """Per-user event-type DIVERSITY via integer Gini impurity — the
    engagement-breadth / exploration metric of behavioral analytics:
    ``gini_q = (n² − Σ c_t²) · 1000000 // n²`` (0 = one type only; →1e6 =
    uniform over many). One (user, type)-keyed combiner-first count, then
    a user-bucketed combine; no per-row Python."""
    ev = _rp(sf_dir, "events", ["user_id", "event_type"])
    pairs = rel.partial_groupby_sum(ev, ["user_id", "event_type"], [],
                                    count_as="c",
                                    est_rows=_nrows(sf_dir, "events"))

    def _gini(df: pd.DataFrame) -> pd.DataFrame:
        c = df["c"].to_numpy(np.int64)
        g = df.assign(c2=c * c).groupby("user_id", as_index=False, sort=False,
                                        observed=True).agg(
            n=("c", "sum"), n_types=("c", "size"), sumsq=("c2", "sum"))
        n = g["n"].to_numpy(np.int64)
        g["gini_q"] = (n * n - g["sumsq"].to_numpy(np.int64)) * 1000000 // (n * n)
        return g[["user_id", "n", "n_types", "gini_q"]].astype(np.int64)

    return rel.bucketed_groups(pairs, ["user_id"], _gini)


SQL_USER_TYPE_GINI = """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
g AS (
  SELECT user_id, SUM(c) AS n, COUNT(*) AS n_types, SUM(c * c) AS sumsq
  FROM c GROUP BY user_id
)
SELECT user_id, CAST(n AS BIGINT) AS n, CAST(n_types AS BIGINT) AS n_types,
       CAST((n * n - sumsq) * 1000000 // (n * n) AS BIGINT) AS gini_q
FROM g
"""


def q_image_otsu(sf_dir: str):  # exact oracle (column-histogram replay)
    """Per-image integer OTSU THRESHOLD of the decoded R channel
    (``media.image_otsu``): automatic binarization ahead of the mask
    pipelines. Kernel = general 256-bin histogram argmax
    (:func:`media.otsu_threshold`, pytest vs brute-force exact-fraction
    comparison); the oracle replays the column-constant R values (jpeg
    dequant included) and scores every candidate split with the identical
    floor-quantized cross-multiplied variance."""
    docs = _rp(sf_dir, "documents", ["doc_id"])

    synth = docs.map_batches(_image_fixture_synth, batch_format="pyarrow", batch_size=512)
    return mstage.image_otsu(synth, batch_size=512)


SQL_IMAGE_OTSU = """
WITH im AS (
  SELECT doc_id AS image_id,
         16 + (doc_id % 4) * 8 AS w, 12 + (doc_id % 3) * 6 AS h,
         doc_id % 3 AS fi, (doc_id * 7) % 200 AS br
  FROM documents
),
cols AS (
  SELECT image_id, w, h, j,
         CASE WHEN fi = 2
              THEN ((br + (j * 55) // (w - 1)) // 4) * 4
                   + ((br + (j * 55) // (w - 1)) // 4) // 16
              ELSE br + (j * 55) // (w - 1) END AS v
  FROM im, (SELECT unnest(range(40)) AS j) js WHERE j < w
),
cand AS (
  SELECT DISTINCT image_id, v AS t
  FROM (SELECT image_id, v, MAX(v) OVER (PARTITION BY image_id) AS mx
        FROM cols)
  WHERE v < mx
),
sc AS (
  SELECT c.image_id, c.t,
         ANY_VALUE(x.h) AS h,
         SUM(CASE WHEN x.v <= c.t THEN 1 ELSE 0 END) AS cb,
         SUM(CASE WHEN x.v <= c.t THEN x.v ELSE 0 END) AS sb,
         COUNT(*) AS cw, SUM(x.v) AS sw
  FROM cand c JOIN cols x USING (image_id)
  GROUP BY c.image_id, c.t
),
scored AS (
  SELECT image_id, t, h * cb AS n_bg,
         (h * sb * (h * (cw - cb)) - h * (sw - sb) * (h * cb))
         * (h * sb * (h * (cw - cb)) - h * (sw - sb) * (h * cb))
         // ((h * cb) * (h * (cw - cb))) AS score
  FROM sc
)
SELECT image_id, CAST(t AS BIGINT) AS otsu_t, CAST(score AS BIGINT) AS score_q,
       CAST(n_bg AS BIGINT) AS n_bg
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY image_id
                                   ORDER BY score DESC, t ASC) AS rn
      FROM scored)
WHERE rn = 1
"""


def q_part_hierarchy_rollup(sf_dir: str):  # exact oracle (recursive chain walk)
    """Ancestor-chain rollup over the implicit part hierarchy
    (parent = p_partkey // 2, partkey 0 the root — the org-chart / BOM /
    thread-tree shape): per part, chain DEPTH and the SUM of p_size over
    self + all ancestors, computed by pointer doubling
    (``graphrank.pointer_double_chain``) — O(log depth) self-joins, the
    PRAM list-ranking pattern, vs the oracle's O(depth) recursive walk."""
    from ..stages.graphrank import pointer_double_chain

    part = _rp(sf_dir, "part", ["p_partkey", "p_size"])

    def _prep(t: pa.Table) -> pa.Table:
        k = t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": k,
                         "parent": np.where(k > 0, k // 2, np.int64(-1)),
                         "val": v})

    state0 = part.map_batches(_prep, batch_format="pyarrow", batch_size=65536)
    out = pointer_double_chain(state0, rounds=6)
    return out.map_batches(
        lambda t: pa.table({"p_partkey": t["node"], "depth": t["depth"],
                            "chain_sum": t["chain_sum"]}),
        batch_format="pyarrow", batch_size=65536)


SQL_PART_HIERARCHY_ROLLUP = """
WITH RECURSIVE chain AS (
  SELECT p_partkey AS node, p_partkey AS cur,
         CAST(p_size AS BIGINT) AS s, CAST(0 AS BIGINT) AS d
  FROM part
  UNION ALL
  SELECT c.node, p.p_partkey, c.s + p.p_size, c.d + 1
  FROM chain c JOIN part p ON p.p_partkey = c.cur // 2
  WHERE c.cur > 0
)
SELECT node AS p_partkey, d AS depth, s AS chain_sum
FROM chain WHERE cur = 0
"""


def q_supplier_qty_trend(sf_dir: str):  # exact oracle (integer cross-moments)
    """Per-supplier ORDINARY-LEAST-SQUARES trend of shipped quantity over
    ship date — the demand-drift detector of a procurement pipeline — in
    exact integer form: slope = slope_num / slope_den and intercept =
    icept_num / slope_den with

        slope_num = n·Σxy − Σx·Σy   slope_den = n·Σx² − (Σx)²
        icept_num = Σy·Σx² − Σx·Σxy

    (x = ship day − day 8000, y = quantity; numerator/denominator reported
    separately so no division semantics enter the hash). One combiner-first
    grouped-sum shuffle of 5 int64 moments; exact while n·Σx² < 2^63
    (n < ~10^8 rows/supplier at this date span — documented bound)."""
    li = _rp(sf_dir, "lineitem", ["l_suppkey", "l_shipdate", "l_quantity"])

    def _derive(t: pa.Table) -> pa.Table:
        ts = t["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        x = ts // 86_400_000_000 - 8000
        y = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"l_suppkey": t["l_suppkey"], "x": x, "y": y,
                         "xy": x * y, "xx": x * x})

    derived = li.map_batches(_derive, batch_format="pyarrow", batch_size=65536)
    sums = rel.partial_groupby_sum(derived, ["l_suppkey"],
                                   ["x", "y", "xy", "xx"], count_as="n",
                                   est_rows=_nrows(sf_dir, "lineitem"))

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(np.int64)
        sx = df["x"].to_numpy(np.int64)
        sy = df["y"].to_numpy(np.int64)
        sxy = df["xy"].to_numpy(np.int64)
        sxx = df["xx"].to_numpy(np.int64)
        return pd.DataFrame({
            "l_suppkey": df["l_suppkey"].to_numpy(np.int64),
            "n": n,
            "slope_num": n * sxy - sx * sy,
            "slope_den": n * sxx - sx * sx,
            "icept_num": sy * sxx - sx * sxy,
        })

    return sums.map_batches(_final, batch_format="pandas", batch_size=65536)


SQL_SUPPLIER_QTY_TREND = """
WITH d AS (
  SELECT l_suppkey,
         epoch_us(l_shipdate) // 86400000000 - 8000 AS x,
         CAST(l_quantity AS BIGINT) AS y
  FROM lineitem
),
s AS (
  SELECT l_suppkey, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM d GROUP BY l_suppkey
)
SELECT l_suppkey, CAST(n AS BIGINT) AS n,
       CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
       CAST(sy * sxx - sx * sxy AS BIGINT) AS icept_num
FROM s
"""


def q_value_mad_by_type(sf_dir: str):  # exact oracle (order statistics)
    """Grouped MEDIAN ABSOLUTE DEVIATION — the robust dispersion twin of
    ``lineitem_group_median``: per event_type, med2 (two-middle-sum median
    of value cents) and mad2 (two-middle-sum of |2·v − med2|, i.e. MAD in
    quarter-cent units) — outliers barely move it where variance explodes.
    Both medians come out of ONE group-shuffled pass (same
    groups-fit-a-worker assumption as ``group_median2``; the in-bucket
    kernel sorts twice, all boundary arithmetic vectorized)."""
    ev = _rp(sf_dir, "events", ["event_type", "value"])

    def _pre(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "vc": pa.array(cents(
                batch["value"].to_numpy(zero_copy_only=False))),
        })

    prep = ev.map_batches(_pre, batch_format="pyarrow", batch_size=16384)

    def _mad(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["event_type", "vc"], kind="mergesort")
        kv = d["event_type"].to_numpy()
        v = d["vc"].to_numpy().astype(np.int64)
        starts = np.flatnonzero(np.r_[True, kv[1:] != kv[:-1]])
        ends = np.r_[starts[1:], len(d)]
        n = ends - starts
        med2 = v[starts + (n - 1) // 2] + v[starts + n // 2]
        dev = np.abs(2 * v - np.repeat(med2, n))
        # second order-statistics pass over deviations, same group layout
        gid = np.repeat(np.arange(len(starts)), n)
        sdev = dev[np.lexsort((dev, gid))]
        mad2 = sdev[starts + (n - 1) // 2] + sdev[starts + n // 2]
        return pd.DataFrame({"event_type": kv[starts],
                             "n_rows": n.astype(np.int64),
                             "med2": med2, "mad2": mad2})

    return rel.bucketed_groups(prep, ["event_type"], _mad,
                               est_rows=_nrows(sf_dir, "events"))


SQL_VALUE_MAD_BY_TYPE = """
WITH v AS (
  SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vc
  FROM events
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY vc) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM v
),
m AS (
  SELECT event_type,
         SUM(CASE WHEN rn = (n + 1) // 2 THEN vc ELSE 0 END)
         + SUM(CASE WHEN rn = (n + 2) // 2 THEN vc ELSE 0 END) AS med2
  FROM r GROUP BY event_type
),
d AS (
  SELECT v.event_type, ABS(2 * v.vc - m.med2) AS dev, m.med2
  FROM v JOIN m USING (event_type)
),
r2 AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dev) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM d
)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_rows,
       CAST(MAX(med2) AS BIGINT) AS med2,
       CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN dev ELSE 0 END)
            + SUM(CASE WHEN rn = (n + 2) // 2 THEN dev ELSE 0 END)
            AS BIGINT) AS mad2
FROM r2 GROUP BY event_type
"""


def q_image_integral_rects(sf_dir: str):  # exact oracle (axis-separable replay)
    """Fixed-rect channel sums via a SUMMED-AREA TABLE through the decode
    path (``media.image_integral_rects``): the Haar-feature / box-statistic
    primitive. R is column-driven and G is row-driven in the gradient
    fixture, so the oracle replays one axis per probe (jpeg dequant
    included) and multiplies by the rect's other extent; the kernel is the
    general SAT (pytest vs brute-force rect sums)."""
    docs = _rp(sf_dir, "documents", ["doc_id"])

    synth = docs.map_batches(_image_fixture_synth, batch_format="pyarrow", batch_size=512)
    return mstage.image_integral_rects(synth, batch_size=512)


SQL_IMAGE_INTEGRAL_RECTS = """
WITH im AS (
  SELECT doc_id AS image_id,
         16 + (doc_id % 4) * 8 AS w, 12 + (doc_id % 3) * 6 AS h,
         doc_id % 3 AS fi,
         (doc_id * 7) % 200 AS br, (doc_id * 11) % 200 AS bg
  FROM documents
),
rc AS (  -- R channel: value depends on column j only
  SELECT image_id, w, h, j,
         CASE WHEN fi = 2
              THEN ((br + (j * 55) // (w - 1)) // 4) * 4
                   + ((br + (j * 55) // (w - 1)) // 4) // 16
              ELSE br + (j * 55) // (w - 1) END AS v
  FROM im, (SELECT unnest(range(40)) AS j) js WHERE j < w
),
gr AS (  -- G channel: value depends on row r only
  SELECT image_id, w, h, r,
         CASE WHEN fi = 2
              THEN ((bg + (r * 41) // (h - 1)) // 4) * 4
                   + ((bg + (r * 41) // (h - 1)) // 4) // 16
              ELSE bg + (r * 41) // (h - 1) END AS g
  FROM im, (SELECT unnest(range(24)) AS r) rs WHERE r < h
),
rq AS (
  SELECT image_id,
         (h // 2) * SUM(CASE WHEN j < w // 2 THEN v ELSE 0 END) AS r_quad_sum
  FROM rc GROUP BY image_id, h
),
gc AS (
  SELECT image_id,
         (w // 2) * SUM(CASE WHEN r >= h // 4 AND r < h // 4 + h // 2
                        THEN g ELSE 0 END) AS g_center_sum
  FROM gr GROUP BY image_id, w
)
SELECT image_id, CAST(r_quad_sum AS BIGINT) AS r_quad_sum,
       CAST(g_center_sum AS BIGINT) AS g_center_sum
FROM rq JOIN gc USING (image_id)
"""


def q_audio_pitch_period(sf_dir: str):  # exact oracle (closed-form argmax)
    """Per-clip PITCH PERIOD by exact integer autocorrelation through the
    genuine WAV decode path (``media.audio_pitch``): the
    fundamental-frequency pass of audio curation. The square-wave fixture
    autocorrelates perfectly at its full period P = 2·(2 + id % 14) — value
    exactly (n − P)·amp² — and strictly worse at every other lag in [2, 64]
    (mismatch cost ≈ 2·amp²·L·n/P dwarfs the (n − L) gain for n ≥ 1000), so
    the oracle is the synthesis closed form; the kernel
    (:func:`media.autocorr_pitch`) is the general argmax, pytest vs brute
    force on random signals."""
    docs = _rp(sf_dir, "documents", ["doc_id"])

    def _synth(batch: pa.Table) -> pa.Table:
        from ..functions import media as M

        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = []
        for i in ids:
            sr = 8000 + (i % 3) * 4000
            n = 1000 + (i * 101) % 4000
            amp = 1000 + (i * 37) % 20000
            p = 2 + i % 14
            t = np.arange(n, dtype=np.int64)
            s = np.where((t // p) % 2 == 0, amp, -amp).astype(np.int16)
            blobs.append(M.encode_wav(s, int(sr)))
        return pa.table({
            "audio_id": ids,
            "bytes": pa.array(blobs, type=pa.binary()),
            "fmt": pa.array(["wav"] * len(ids), type=pa.string()),
        })

    synth = docs.map_batches(_synth, batch_format="pyarrow", batch_size=512)
    return mstage.audio_pitch(synth, batch_size=512)


SQL_AUDIO_PITCH_PERIOD = """
SELECT doc_id AS audio_id,
       2 * (2 + doc_id % 14) AS pitch_lag,
       (1000 + (doc_id * 101) % 4000 - 2 * (2 + doc_id % 14))
         * (1000 + (doc_id * 37) % 20000)
         * (1000 + (doc_id * 37) % 20000) AS corr_peak
FROM documents
"""


def q_embedding_gram(sf_dir: str):  # exact oracle (unnest self-join)
    """Distributed GRAM MATRIX X^T X of the fixed-point embeddings
    (``ann.gram_matrix``) — the covariance/PCA precursor: per-batch int64
    ``V.T @ V`` partials (the ideal combiner — dim² rows shuffle per batch
    no matter how many rows fed it) + one dim²-keyed grouped sum. The SQL
    mirror unnests the vector twice and self-joins on vec_id."""
    emb = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    from ..stages.ann import gram_matrix

    return gram_matrix(emb, dim=64)


SQL_EMBEDDING_GRAM = """
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
         CAST(FLOOR(unnest(embedding) * 1e6 + 0.5) AS BIGINT) AS v
  FROM embeddings
)
SELECT a.d AS i, b.d AS j, CAST(SUM(a.v * b.v) AS BIGINT) AS gram
FROM q a JOIN q b USING (vec_id)
GROUP BY a.d, b.d
"""


def q_image_caption_consistency(sf_dir: str):  # exact oracle (closed form)
    """CROSS-MODAL pair validation over the native (image, caption) shape
    (``media.image_caption_check``): decode the payload for its TRUE WxH,
    regex-parse the caption's claimed WxH, flag mismatches — the
    data-quality gate of a scraped corpus (≙ BASELINE.json's caption-half
    of the per-row invariant as an operator). Fixture: every 17th caption
    LIES about the width (w+8), so `consistent` is non-trivially mixed;
    the oracle is the synthesis closed form."""
    from ..functions import codecs

    docs = _rp(sf_dir, "documents", ["doc_id"])
    fmts3 = ["bmp", "png", "jpeg"]

    def _synth(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs, fmts, caps = [], [], []
        for i in ids:
            w, h = int(16 + (i % 4) * 8), int(12 + (i % 3) * 6)
            img = np.empty((h, w, 3), dtype=np.uint8)
            img[:, :, 0] = np.uint8((i * 7) % 200)
            img[:, :, 1] = np.uint8((i * 11) % 200)
            img[:, :, 2] = (i * 3) % 200
            fmt = fmts3[int(i % 3)]
            blobs.append(codecs.encode(img, fmt))
            fmts.append(fmt)
            w_claim = w + 8 if i % 17 == 0 else w
            caps.append(f"photo {w_claim}x{h} tone {int(i * 13) % 7}")
        return pa.table({
            "image_id": ids,
            "bytes": pa.array(blobs, type=pa.binary()),
            "fmt": pa.array(fmts, type=pa.string()),
            "caption": pa.array(caps, type=pa.string()),
        })

    synth = docs.map_batches(_synth, batch_format="pyarrow", batch_size=512)
    return mstage.image_caption_check(synth, batch_size=512)


SQL_IMAGE_CAPTION_CONSISTENCY = """
SELECT doc_id AS image_id,
       16 + (doc_id % 4) * 8 AS w_true,
       12 + (doc_id % 3) * 6 AS h_true,
       16 + (doc_id % 4) * 8
         + CASE WHEN doc_id % 17 = 0 THEN 8 ELSE 0 END AS w_caption,
       12 + (doc_id % 3) * 6 AS h_caption,
       CASE WHEN doc_id % 17 = 0 THEN 0 ELSE 1 END AS consistent
FROM documents
"""


def q_image_equalize(sf_dir: str):  # exact oracle (h cancels in the floor)
    """Per-image HISTOGRAM-EQUALIZATION checksum of the decoded R channel
    (``media.image_equalize``): the contrast-normalization pass. Kernel =
    general 256-bin discrete equalization (:func:`media.equalize_checksum`,
    pytest vs per-pixel brute force); the oracle replays the
    column-constant R values — cdf counts share the factor h with n, which
    cancels exactly inside the floor division, so the per-column replay is
    bit-exact (eq_sum then scales back by h)."""
    docs = _rp(sf_dir, "documents", ["doc_id"])

    synth = docs.map_batches(_image_fixture_synth, batch_format="pyarrow", batch_size=512)
    return mstage.image_equalize(synth, batch_size=512)


SQL_IMAGE_EQUALIZE = """
WITH im AS (
  SELECT doc_id AS image_id,
         16 + (doc_id % 4) * 8 AS w, 12 + (doc_id % 3) * 6 AS h,
         doc_id % 3 AS fi, (doc_id * 7) % 200 AS br
  FROM documents
),
cols AS (
  SELECT image_id, w, h, j,
         CASE WHEN fi = 2
              THEN ((br + (j * 55) // (w - 1)) // 4) * 4
                   + ((br + (j * 55) // (w - 1)) // 4) // 16
              ELSE br + (j * 55) // (w - 1) END AS v
  FROM im, (SELECT unnest(range(40)) AS j) js WHERE j < w
),
cd AS (
  SELECT image_id, w, h, v,
         SUM(1) OVER (PARTITION BY image_id ORDER BY v
                      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS c_le,
         SUM(CASE WHEN v = mn THEN 1 ELSE 0 END)
           OVER (PARTITION BY image_id) AS c_min
  FROM (SELECT *, MIN(v) OVER (PARTITION BY image_id) AS mn FROM cols)
),
eq AS (
  SELECT image_id, h,
         CASE WHEN w > c_min
              THEN (c_le - c_min) * 255 // (w - c_min) ELSE 0 END AS nv
  FROM cd
)
SELECT image_id, CAST(MAX(h) * SUM(nv) AS BIGINT) AS eq_sum,
       CAST(COUNT(DISTINCT nv) AS BIGINT) AS eq_distinct
FROM eq GROUP BY image_id
"""


def q_video_motion_estimate(sf_dir: str):  # exact oracle (unique zero-SAD)
    """BLOCK-MATCHING MOTION ESTIMATION between the first two frames of
    each clip (``media.video_motion``): the fixture translates a monotone
    horizontal ramp +2 px/frame over a strictly increasing vertical ramp
    (QVID is lossless), so (dy, dx) = (0, 2) is the unique zero-SAD shift
    in the ±4 search box — any dy≠0 offsets every row by a nonzero
    constant, any dx≠2 leaves a non-constant column difference. The
    no-motion cost sad00 is replayed exactly per column (the row term
    cancels at dy = 0). Kernel = general SAD scan
    (:func:`media.block_motion`), pytest vs brute force."""
    docs = _rp(sf_dir, "documents", ["doc_id"])

    def _synth(batch: pa.Table) -> pa.Table:
        from ..functions import media as M

        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = []
        for i in ids:
            w, h = int(16 + (i % 4) * 8), int(12 + (i % 3) * 6)
            br = (i * 7) % 150
            g = ((np.arange(w, dtype=np.int64) * 55) // (w - 1))
            f_r = ((np.arange(h, dtype=np.int64) * 41) // (h - 1))
            frames = np.empty((2, h, w, 3), dtype=np.uint8)
            for f in range(2):
                shifted = np.roll(g, 2 * f)
                frames[f, :, :, 0] = (br + shifted[None, :]
                                      + f_r[:, None]).astype(np.uint8)
                frames[f, :, :, 1] = (i * 11) % 200
                frames[f, :, :, 2] = (i * 3) % 200
            blobs.append(M.encode_video(frames, fps=24))
        return pa.table({"video_id": ids,
                         "bytes": pa.array(blobs, type=pa.binary())})

    synth = docs.map_batches(_synth, batch_format="pyarrow", batch_size=256)
    return mstage.video_motion(synth, radius=4, batch_size=256)


SQL_VIDEO_MOTION_ESTIMATE = """
WITH im AS (
  SELECT doc_id AS video_id,
         16 + (doc_id % 4) * 8 AS w, 12 + (doc_id % 3) * 6 AS h
  FROM documents
),
cols AS (
  SELECT video_id, h,
         ABS((((j + w - 2) % w) * 55) // (w - 1) - (j * 55) // (w - 1))
           AS d
  FROM im, (SELECT unnest(range(40)) AS j) js WHERE j < w
)
SELECT video_id, CAST(0 AS BIGINT) AS dy_best, CAST(2 AS BIGINT) AS dx_best,
       CAST(0 AS BIGINT) AS sad_best, CAST(h * SUM(d) AS BIGINT) AS sad00
FROM cols GROUP BY video_id, h
"""


def q_doc_collocations(sf_dir: str):  # exact oracle (integer PMI argument)
    """PMI COLLOCATION MINING (``textops.collocation_pmi``): adjacent word
    pairs ranked by the integer-quantized PMI argument
    ``c_xy·N²·100 // (c_x·c_y·M)`` — the phrase-discovery pass of corpus
    curation. Text never shuffles; the unigram table is vocab-bounded and
    broadcast into the bigram finisher."""
    docs = _rp(sf_dir, "documents", ["text"])
    return textops.collocation_pmi(docs, min_count=5,
                                   est_rows=_nrows(sf_dir, "documents"))


SQL_DOC_COLLOCATIONS = """
WITH ws AS (
  SELECT regexp_extract_all(lower(text), '[0-9a-z_]+') AS w FROM documents
),
uc AS (
  SELECT word, COUNT(*) AS c
  FROM (SELECT unnest(w) AS word FROM ws) GROUP BY word
),
nn AS (SELECT SUM(c) AS n FROM uc),
bc AS (
  SELECT w1, w2, COUNT(*) AS cxy FROM (
    SELECT w[j] AS w1, w[j + 1] AS w2
    FROM ws, (SELECT unnest(range(1, 200)) AS j) js WHERE j < len(w)
  ) GROUP BY w1, w2
),
mm AS (SELECT SUM(cxy) AS m FROM bc)
SELECT b.w1, b.w2, CAST(b.cxy AS BIGINT) AS c_xy,
       CAST(b.cxy * nn.n * nn.n * 100 // (u1.c * u2.c * mm.m) AS BIGINT)
         AS pmi_q
FROM bc b
JOIN uc u1 ON u1.word = b.w1
JOIN uc u2 ON u2.word = b.w2
CROSS JOIN nn CROSS JOIN mm
WHERE b.cxy >= 5
"""


def q_part_abc_classes(sf_dir: str):  # exact oracle (windowed cum share)
    """ABC / PARETO CLASSIFICATION of parts by revenue
    (``relational.abc_classes``): rank by revenue cents descending, class A
    through 70 % cumulative share, B to 90 %, C beyond — thresholds
    compared cross-multiplied so no division enters the hash. The global
    ranked prefix sum is two-phase (value-band totals -> driver cumsum over
    the bounded band list -> one band-bucketed finish), never a single-node
    sort."""
    li = _rp(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"])

    def _pre(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": batch["l_partkey"],
            "rev_c": pa.array(cents(
                batch["l_extendedprice"].to_numpy(zero_copy_only=False))),
        })

    prep = li.map_batches(_pre, batch_format="pyarrow", batch_size=16384)
    rev = rel.partial_groupby_sum(prep, ["l_partkey"], ["rev_c"],
                                  est_rows=_nrows(sf_dir, "lineitem"))
    return rel.abc_classes(rev, "l_partkey", "rev_c")


SQL_PART_ABC_CLASSES = """
WITH pr AS (
  SELECT l_partkey,
         SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS rev_c
  FROM lineitem GROUP BY l_partkey
),
r AS (
  SELECT l_partkey, rev_c,
         SUM(rev_c) OVER (ORDER BY rev_c DESC, l_partkey) AS cum,
         SUM(rev_c) OVER () AS tot
  FROM pr
)
SELECT l_partkey, CAST(rev_c AS BIGINT) AS rev_c,
       CASE WHEN cum * 10 <= tot * 7 THEN 'A'
            WHEN cum * 10 <= tot * 9 THEN 'B'
            ELSE 'C' END AS abc_class
FROM r
"""


def q_image_wht_energy(sf_dir: str):  # exact oracle (1D collapse per axis)
    """WALSH-HADAMARD transform energy of the top-left 8×8 crop through
    the decode path (``media.image_wht_energy``): the exact-integer DCT
    sibling — energy split between low-sequency (popcount(u)+popcount(v)
    <= 1) and high-sequency coefficients, the transform-domain
    blur/complexity feature. The fixture's R channel is column-driven and
    G row-driven, so in the oracle only the u=0 (resp. v=0) transform line
    survives (all other Hadamard rows sum to zero) and each side collapses
    to an 8-point 1D transform replayed with bit_count signs."""
    docs = _rp(sf_dir, "documents", ["doc_id"])

    synth = docs.map_batches(_image_fixture_synth, batch_format="pyarrow", batch_size=512)
    return mstage.image_wht_energy(synth, batch_size=512)


# R crop is column-constant -> 2D coef(u,v) = 0 unless u = 0, and
# coef(0,v) = 8 * sum_j sign(v,j) * R(j); symmetrically for G with rows.
# low sequency = popcount(u)+popcount(v) <= 1: for the surviving line that
# is v in {0,1,2,4}.
SQL_IMAGE_WHT_ENERGY = """
WITH im AS (
  SELECT doc_id AS image_id,
         16 + (doc_id % 4) * 8 AS w, 12 + (doc_id % 3) * 6 AS h,
         doc_id % 3 AS fi,
         (doc_id * 7) % 200 AS br, (doc_id * 11) % 200 AS bg
  FROM documents
),
px AS (
  SELECT image_id, j,
         CASE WHEN fi = 2
              THEN ((br + (j * 55) // (w - 1)) // 4) * 4
                   + ((br + (j * 55) // (w - 1)) // 4) // 16
              ELSE br + (j * 55) // (w - 1) END AS r,
         CASE WHEN fi = 2
              THEN ((bg + (j * 41) // (h - 1)) // 4) * 4
                   + ((bg + (j * 41) // (h - 1)) // 4) // 16
              ELSE bg + (j * 41) // (h - 1) END AS g
  FROM im, (SELECT unnest(range(8)) AS j) js
),
coef AS (
  SELECT image_id, v,
         SUM(CASE WHEN bit_count(v & j) % 2 = 1 THEN -r ELSE r END) AS cr,
         SUM(CASE WHEN bit_count(v & j) % 2 = 1 THEN -g ELSE g END) AS cg
  FROM px, (SELECT unnest(range(8)) AS v) vs
  GROUP BY image_id, v
)
SELECT image_id,
       CAST(64 * SUM(CASE WHEN bit_count(v) <= 1 THEN cr * cr ELSE 0 END)
            AS BIGINT) AS r_low,
       CAST(64 * SUM(CASE WHEN bit_count(v) > 1 THEN cr * cr ELSE 0 END)
            AS BIGINT) AS r_high,
       CAST(64 * SUM(CASE WHEN bit_count(v) <= 1 THEN cg * cg ELSE 0 END)
            AS BIGINT) AS g_low,
       CAST(64 * SUM(CASE WHEN bit_count(v) > 1 THEN cg * cg ELSE 0 END)
            AS BIGINT) AS g_high
FROM coef GROUP BY image_id
"""


def q_orders_seasonal_index(sf_dir: str):  # exact oracle (cross-mult ratio)
    """Monthly SEASONAL INDEX of order revenue — month average vs overall
    average, the classic retail seasonality diagnostic — as the exact
    integer quantization ``idx_q = m_sum·n_total·1000 // (total·n_month)``
    (1000 = neutral). One combiner-first month rollup (12 rows) then
    driver-side Python-int arithmetic, so no int64 overflow at any scale."""
    orders = _rp(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def _pre(batch: pa.Table) -> pa.Table:
        ts = batch["o_orderdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        # month from epoch-us via pandas (vectorized), matching SQL month()
        mon = pd.to_datetime(ts, unit="us").month.to_numpy()
        return pa.table({
            "month": mon.astype(np.int64),
            "price_c": pa.array(cents(
                batch["o_totalprice"].to_numpy(zero_copy_only=False))),
        })

    prep = orders.map_batches(_pre, batch_format="pyarrow", batch_size=16384)
    sums = rel.partial_groupby_sum(prep, ["month"], ["price_c"],
                                   count_as="n_orders",
                                   est_rows=_nrows(sf_dir, "orders"))
    df = sums.to_pandas()  # 12 rows
    total = int(df["price_c"].sum())
    n_total = int(df["n_orders"].sum())
    idx = [int(m) * n_total * 1000 // (total * int(n))
           for m, n in zip(df["price_c"], df["n_orders"])]
    out = pd.DataFrame({
        "month": df["month"].astype(np.int64),
        "n_orders": df["n_orders"].astype(np.int64),
        "sum_c": df["price_c"].astype(np.int64),
        "idx_q": np.array(idx, dtype=np.int64),
    })
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_ORDERS_SEASONAL_INDEX = """
WITH m AS (
  SELECT month(o_orderdate) AS month, COUNT(*) AS n_orders,
         SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS sum_c
  FROM orders GROUP BY month
),
t AS (SELECT SUM(sum_c) AS total, SUM(n_orders) AS n_total FROM m)
SELECT month, CAST(n_orders AS BIGINT) AS n_orders,
       CAST(sum_c AS BIGINT) AS sum_c,
       CAST(sum_c * n_total * 1000 // (total * n_orders) AS BIGINT) AS idx_q
FROM m, t
"""


def q_traj_turn_octants(sf_dir: str):  # exact oracle (CASE-order mirror)
    """Per-trajectory TURNING-BEHAVIOR stats (``spatial.traj_turn_stats``)
    over the stay-point traces: octant-coded step directions (pure
    sign/compare, no atan2), octant-change counts, stationary steps, and
    the modal octant with smallest-code ties — the heading-dynamics
    summary that separates directed travel from dwell drift."""
    ev = _rp(sf_dir, "events", ["event_id"])
    nk = 50

    def _synth(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        traj = eid % nk
        seq = eid // nk
        blk = seq // (8 + traj % 5)
        spike = np.where((seq * 7919) % 23 == 0, 40, 0)
        x = traj * 100000 + blk * 1000 + (seq * 2654435761) % 13 + spike
        y = blk * 1000 + (seq * 40503) % 11
        return pa.table({"traj_id": traj, "seq": seq,
                         "x": x.astype(np.int64), "y": y.astype(np.int64)})

    pts = ev.map_batches(_synth, batch_format="pyarrow", batch_size=8192)
    return spatial.traj_turn_stats(pts, "traj_id", "seq", "x", "y",
                                   est_rows=_nrows(sf_dir, "events"))


SQL_TRAJ_TURN_OCTANTS = """
WITH xy AS (
  SELECT event_id % 50 AS traj_id, event_id // 50 AS seq,
         (event_id % 50) * 100000
           + ((event_id // 50) // (8 + (event_id % 50) % 5)) * 1000
           + ((event_id // 50) * 2654435761) % 13
           + CASE WHEN ((event_id // 50) * 7919) % 23 = 0
                  THEN 40 ELSE 0 END AS x,
         ((event_id // 50) // (8 + (event_id % 50) % 5)) * 1000
           + ((event_id // 50) * 40503) % 11 AS y
  FROM events
),
st AS (
  SELECT traj_id, seq,
         x - lag(x) OVER w AS dx, y - lag(y) OVER w AS dy
  FROM xy WINDOW w AS (PARTITION BY traj_id ORDER BY seq)
),
oc AS (
  SELECT traj_id, seq,
         CASE WHEN dx = 0 AND dy = 0 THEN 8
              WHEN 2 * ABS(dy) <= ABS(dx) AND dx > 0 THEN 0
              WHEN 2 * ABS(dy) <= ABS(dx) THEN 4
              WHEN 2 * ABS(dx) <= ABS(dy) AND dy > 0 THEN 2
              WHEN 2 * ABS(dx) <= ABS(dy) THEN 6
              WHEN dx > 0 AND dy > 0 THEN 1
              WHEN dx < 0 AND dy > 0 THEN 3
              WHEN dx < 0 AND dy < 0 THEN 5
              ELSE 7 END AS o
  FROM st WHERE dx IS NOT NULL
),
seqd AS (
  SELECT traj_id, o,
         lag(o) OVER (PARTITION BY traj_id ORDER BY seq) AS po
  FROM oc
),
dom AS (
  SELECT traj_id, o AS dom_oct FROM (
    SELECT traj_id, o, COUNT(*) AS c,
           ROW_NUMBER() OVER (PARTITION BY traj_id
                              ORDER BY COUNT(*) DESC, o ASC) AS rn
    FROM oc GROUP BY traj_id, o
  ) WHERE rn = 1
)
SELECT q.traj_id, CAST(q.n_steps AS BIGINT) AS n_steps,
       CAST(q.n_turns AS BIGINT) AS n_turns,
       CAST(q.n_stationary AS BIGINT) AS n_stationary,
       CAST(dom.dom_oct AS BIGINT) AS dom_oct
FROM (
  SELECT traj_id, COUNT(*) AS n_steps,
         SUM(CASE WHEN po IS NOT NULL AND o <> po THEN 1 ELSE 0 END)
           AS n_turns,
         SUM(CASE WHEN o = 8 THEN 1 ELSE 0 END) AS n_stationary
  FROM seqd GROUP BY traj_id
) q JOIN dom USING (traj_id)
"""


def q_tile_label_propagation(sf_dir: str):  # exact oracle (unrolled rounds)
    """Semi-supervised LABEL PROPAGATION over the tile kNN graph
    (``graphrank.label_propagation_rounds``, 2 rounds): every 25th tile is
    seeded with label ``tile_id % 7``; each round a node adopts the MODAL
    label of its labeled in-neighbors (ties to the smallest label), seeds
    clamped — the graph-ML label-spreading pass next to PageRank (value
    propagation) and CC (min propagation). Oracle unrolls both rounds as
    MATERIALIZED mode selections."""
    from ..stages.graphrank import label_propagation_rounds

    knn = q_tile_knn_graph(sf_dir)

    def _edges(t: pa.Table) -> pa.Table:
        s = t["src_tile"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["tile_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = s != d
        s, d = s[m], d[m]
        return pa.table({"src": np.concatenate([s, d]),
                         "dst": np.concatenate([d, s])})

    edges = knn.map_batches(_edges, batch_format="pyarrow",
                            batch_size=65536).materialize()
    part = _rp(sf_dir, "part", ["p_partkey", "p_size"])

    def _seeds(batch: pa.Table) -> pa.Table:
        t = td.tiles_batch(batch)
        tid = t["tile_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tid = tid[tid % 25 == 0]
        return pa.table({"node": tid, "label": tid % 7})

    seeds = part.map_batches(_seeds, batch_format="pyarrow",
                             batch_size=65536)
    out = label_propagation_rounds(edges, seeds, rounds=2)
    return out.map_batches(
        lambda t: pa.table({"tile_id": t["node"], "label": t["label"]}),
        batch_format="pyarrow", batch_size=65536)


_SQL_LP_HEAD = f"""
WITH tiles AS ({td.TILES_SQL}),
probes AS (SELECT tile_id AS src_tile, cx AS px, cy AS py
           FROM tiles WHERE tile_id % 10 = 0),
knn AS (
  SELECT src_tile, tile_id FROM (
    SELECT p.src_tile, t.tile_id,
           ROW_NUMBER() OVER (
             PARTITION BY p.src_tile
             ORDER BY (p.px - t.cx) * (p.px - t.cx)
                    + (p.py - t.cy) * (p.py - t.cy), t.tile_id) AS knn_rank
    FROM probes p CROSS JOIN tiles t
  ) WHERE knn_rank <= 4
),
ed AS MATERIALIZED (
  SELECT src_tile AS s, tile_id AS t FROM knn WHERE tile_id <> src_tile
  UNION ALL
  SELECT tile_id, src_tile FROM knn WHERE tile_id <> src_tile
),
d0 AS (SELECT tile_id AS node, tile_id % 7 AS label
       FROM tiles WHERE tile_id % 25 = 0)
"""

SQL_TILE_LABEL_PROPAGATION = _SQL_LP_HEAD + "".join(
    f""",
d{r + 1} AS MATERIALIZED (
  SELECT node, label FROM d0
  UNION ALL
  SELECT node, label FROM (
    SELECT e.t AS node, d{r}.label, COUNT(*) AS c,
           ROW_NUMBER() OVER (PARTITION BY e.t
                              ORDER BY COUNT(*) DESC, d{r}.label ASC) AS rn
    FROM d{r} JOIN ed e ON e.s = d{r}.node
    GROUP BY e.t, d{r}.label
  ) WHERE rn = 1 AND node NOT IN (SELECT node FROM d0)
)"""
    for r in range(2)
) + """
SELECT node AS tile_id, CAST(label AS BIGINT) AS label FROM d2
"""


def q_image_laplacian_noise(sf_dir: str):  # exact oracle (1D stencil replay)
    """Per-image LAPLACIAN-ENERGY blur/noise metric through the decode path
    (``media.image_laplacian``): sum of squared 4-neighbor Laplacian
    responses over interior pixels, on both fixture axes (R column-driven,
    G row-driven — each collapses the 2D stencil to a 1D second
    difference in the oracle; the kernel stays the general 2D stencil)."""
    docs = _rp(sf_dir, "documents", ["doc_id"])

    synth = docs.map_batches(_image_fixture_synth, batch_format="pyarrow", batch_size=512)
    return mstage.image_laplacian(synth, batch_size=512)


SQL_IMAGE_LAPLACIAN_NOISE = """
WITH im AS (
  SELECT doc_id AS image_id,
         16 + (doc_id % 4) * 8 AS w, 12 + (doc_id % 3) * 6 AS h,
         doc_id % 3 AS fi,
         (doc_id * 7) % 200 AS br, (doc_id * 11) % 200 AS bg
  FROM documents
),
rc AS (
  SELECT image_id, w, h, j,
         CASE WHEN fi = 2
              THEN ((br + (j * 55) // (w - 1)) // 4) * 4
                   + ((br + (j * 55) // (w - 1)) // 4) // 16
              ELSE br + (j * 55) // (w - 1) END AS v
  FROM im, (SELECT unnest(range(40)) AS j) js WHERE j < w
),
gr AS (
  SELECT image_id, w, h, r,
         CASE WHEN fi = 2
              THEN ((bg + (r * 41) // (h - 1)) // 4) * 4
                   + ((bg + (r * 41) // (h - 1)) // 4) // 16
              ELSE bg + (r * 41) // (h - 1) END AS g
  FROM im, (SELECT unnest(range(24)) AS r) rs WHERE r < h
),
rc2 AS (
  SELECT image_id, w, h, j,
         2 * v - lag(v) OVER wd - lead(v) OVER wd AS lap
  FROM rc WINDOW wd AS (PARTITION BY image_id ORDER BY j)
),
gr2 AS (
  SELECT image_id, w, h, r,
         2 * g - lag(g) OVER wd - lead(g) OVER wd AS lap
  FROM gr WINDOW wd AS (PARTITION BY image_id ORDER BY r)
),
rl AS (
  SELECT image_id,
         (h - 2) * SUM(CASE WHEN j >= 1 AND j <= w - 2
                       THEN lap * lap ELSE 0 END) AS r_lap
  FROM rc2 GROUP BY image_id, h
),
gl AS (
  SELECT image_id,
         (w - 2) * SUM(CASE WHEN r >= 1 AND r <= h - 2
                       THEN lap * lap ELSE 0 END) AS g_lap
  FROM gr2 GROUP BY image_id, w
)
SELECT image_id, CAST(r_lap AS BIGINT) AS r_lap,
       CAST(g_lap AS BIGINT) AS g_lap
FROM rl JOIN gl USING (image_id)
"""


def q_orders_benford_digits(sf_dir: str):  # exact oracle (string first digit)
    """BENFORD first-digit distribution of order totals per priority class
    — the forensic digit-frequency screen for fabricated values: counts of
    the leading digit of the price cents, one combiner-first
    (priority, digit) rollup. The digit is extracted by pure integer
    division (repeated ÷10, vectorized), mirrored in SQL via the leading
    character."""
    orders = _rp(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def _pre(batch: pa.Table) -> pa.Table:
        v = cents(batch["o_totalprice"].to_numpy(zero_copy_only=False))
        d = v.copy()
        while (d >= 10).any():
            big = d >= 10
            d[big] //= 10
        return pa.table({"o_orderpriority": batch["o_orderpriority"],
                         "digit": d})

    prep = orders.map_batches(_pre, batch_format="pyarrow", batch_size=16384)
    return rel.partial_groupby_sum(prep, ["o_orderpriority", "digit"], [],
                                   count_as="n",
                                   est_rows=_nrows(sf_dir, "orders"))


SQL_ORDERS_BENFORD_DIGITS = """
SELECT o_orderpriority,
       CAST(substr(CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                        AS VARCHAR), 1, 1) AS BIGINT) AS digit,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders GROUP BY 1, 2
"""


def q_grid_heat_diffusion(sf_dir: str):  # exact oracle (unrolled stencil)
    """Two rounds of integer HEAT DIFFUSION over the probe-point density
    raster (``spatial.grid_heat_diffusion``): v' = (4v + Σ 4-neighbors)//8,
    zeros dropped — the iterative stencil-relaxation pattern (PDE lite)
    next to the one-shot box blur. Oracle unrolls both rounds as weighted
    offset joins."""
    pts = conflation.read_points(sf_dir)
    return spatial.grid_heat_diffusion(pts, "px", "py", cell=1024, rounds=2)


SQL_GRID_HEAT_DIFFUSION = _CTES + """,
d0 AS (
  SELECT px // 1024 AS cx, py // 1024 AS cy, COUNT(*) AS v
  FROM points GROUP BY 1, 2
),
offs(ox, oy, wgt) AS (VALUES (0, 0, 4), (1, 0, 1), (-1, 0, 1),
                             (0, 1, 1), (0, -1, 1)),
d1 AS MATERIALIZED (
  SELECT cx, cy, v FROM (
    SELECT d0.cx + o.ox AS cx, d0.cy + o.oy AS cy,
           SUM(d0.v * o.wgt) // 8 AS v
    FROM d0 CROSS JOIN offs o GROUP BY 1, 2
  ) WHERE v > 0
),
d2 AS MATERIALIZED (
  SELECT cx, cy, v FROM (
    SELECT d1.cx + o.ox AS cx, d1.cy + o.oy AS cy,
           SUM(d1.v * o.wgt) // 8 AS v
    FROM d1 CROSS JOIN offs o GROUP BY 1, 2
  ) WHERE v > 0
)
SELECT cx, cy, CAST(v AS BIGINT) AS v FROM d2
"""


def q_image_palette(sf_dir: str):  # exact oracle (factorized color counts)
    """Per-image PALETTE PROFILE through the decode path
    (``media.image_palette``): distinct-color count, modal packed color
    (smallest on ties) and its pixel count — the palette-complexity screen
    separating diagrams from photographs. The fixture factorizes (R by
    column × G by row, B constant), so the oracle cross-joins per-value
    column and row multiplicities; the kernel is the general pixel-multiset
    profile."""
    docs = _rp(sf_dir, "documents", ["doc_id"])

    synth = docs.map_batches(_image_fixture_synth, batch_format="pyarrow", batch_size=512)
    return mstage.image_palette(synth, batch_size=512)


SQL_IMAGE_PALETTE = """
WITH """ + _SQL_IM3 + """,
rv AS (
  SELECT image_id, v, COUNT(*) AS c FROM (
    SELECT image_id,
           CASE WHEN fi = 2
                THEN ((br + (j * 55) // (w - 1)) // 4) * 4
                     + ((br + (j * 55) // (w - 1)) // 4) // 16
                ELSE br + (j * 55) // (w - 1) END AS v
    FROM im, (SELECT unnest(range(40)) AS j) js WHERE j < w
  ) GROUP BY image_id, v
),
gv AS (
  SELECT image_id, g, COUNT(*) AS c FROM (
    SELECT image_id,
           CASE WHEN fi = 2
                THEN ((bg + (r * 41) // (h - 1)) // 4) * 4
                     + ((bg + (r * 41) // (h - 1)) // 4) // 16
                ELSE bg + (r * 41) // (h - 1) END AS g
    FROM im, (SELECT unnest(range(24)) AS r) rs WHERE r < h
  ) GROUP BY image_id, g
),
bb AS (
  SELECT image_id,
         CASE WHEN fi = 2 THEN (bb // 4) * 4 + (bb // 4) // 16
              ELSE bb END AS b
  FROM im
),
nc AS (
  SELECT r.image_id,
         (SELECT COUNT(*) FROM rv WHERE rv.image_id = r.image_id)
           * (SELECT COUNT(*) FROM gv WHERE gv.image_id = r.image_id)
           AS n_colors
  FROM (SELECT DISTINCT image_id FROM rv) r
),
top AS (
  SELECT image_id, v, g, cc FROM (
    SELECT rv.image_id, rv.v, gv.g, rv.c * gv.c AS cc,
           ROW_NUMBER() OVER (PARTITION BY rv.image_id
                              ORDER BY rv.c * gv.c DESC, rv.v ASC, gv.g ASC)
             AS rn
    FROM rv JOIN gv USING (image_id)
  ) WHERE rn = 1
)
SELECT t.image_id, CAST(nc.n_colors AS BIGINT) AS n_colors,
       CAST(t.v * 65536 + t.g * 256 + bb.b AS BIGINT) AS top_color,
       CAST(t.cc AS BIGINT) AS top_count
FROM top t JOIN nc USING (image_id) JOIN bb USING (image_id)
"""


def q_part_weighted_sample(sf_dir: str):  # exact oracle (priority top-k)
    """Deterministic WEIGHTED SAMPLING of parts (k = 100): priority =
    knuth32(partkey) // p_size, global k smallest (priority, key) — the
    integer exponential-clock scheme (heavier parts draw smaller
    priorities proportionally more often), reproducible across runs and
    cluster sizes, no RNG state (the weighted sibling of
    ``relational.hash_sample``)."""
    part = _rp(sf_dir, "part", ["p_partkey", "p_size"])

    def _prio(batch: pa.Table) -> pa.Table:
        ids = batch["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        masked = (ids & np.int64(0xFFFFFFFF)).astype(np.uint64)
        h = ((masked * np.uint64(2654435761)) % np.uint64(1 << 32)).astype(np.int64)
        return pa.table({"p_partkey": ids, "p_size": w, "priority": h // w})

    prio = part.map_batches(_prio, batch_format="pyarrow", batch_size=65536)
    return prio.sort(["priority", "p_partkey"]).limit(100)


SQL_PART_WEIGHTED_SAMPLE = """
SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size,
       ((p_partkey & 4294967295) * 2654435761 % 4294967296)
         // p_size AS priority
FROM part ORDER BY priority, p_partkey LIMIT 100
"""


def q_grid_nearest_site(sf_dir: str):  # exact oracle (argmin cross join)
    """Discrete VORONOI partition (``spatial.grid_nearest_sites``): every
    occupied density-raster cell assigned to the nearest site (exact int
    center-to-site dist², ties to smallest site_id; sites = every 40th
    tile centroid), rolled up per site — the nearest-facility / coverage-
    allocation primitive. Site table broadcast once per worker; the only
    shuffle is the grid-sized per-site rollup."""
    # site table is dimension-sized: derive it driver-side from the tile
    # table (same footer-pruned read tiles_ref uses) and broadcast once
    t = td.tiles_table(sf_dir)
    keep = pa.array(t["tile_id"].to_numpy() % 40 == 0)
    t = t.filter(keep)
    sites = pa.table({"site_id": t["tile_id"], "sx": t["cx"],
                      "sy": t["cy"]})
    pts = conflation.read_points(sf_dir)
    return spatial.grid_nearest_sites(pts, ray.put(sites), "px", "py",
                                      cell=1024,
                                      est_rows=_nrows(sf_dir, "lineitem"))


SQL_GRID_NEAREST_SITE = _CTES + """,
d0 AS (SELECT px // 1024 AS cx, py // 1024 AS cy, COUNT(*) AS v
       FROM points GROUP BY 1, 2),
sites AS (SELECT tile_id AS site_id, cx AS sx, cy AS sy
          FROM tiles WHERE tile_id % 40 = 0),
asg AS (
  SELECT cx, cy, v, site_id FROM (
    SELECT d0.cx, d0.cy, d0.v, s.site_id,
           ROW_NUMBER() OVER (
             PARTITION BY d0.cx, d0.cy
             ORDER BY (d0.cx * 1024 + 512 - s.sx) * (d0.cx * 1024 + 512 - s.sx)
                    + (d0.cy * 1024 + 512 - s.sy) * (d0.cy * 1024 + 512 - s.sy),
                      s.site_id) AS rn
    FROM d0 CROSS JOIN sites s
  ) WHERE rn = 1
)
SELECT site_id, CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(v) AS BIGINT) AS mass
FROM asg GROUP BY 1
"""


def q_fk_integrity_audit(sf_dir: str):  # exact oracle (left-join counts)
    """Referential-integrity AUDIT over the star schema — the data-quality
    gate every warehouse load runs: for each FK relation, total child
    rows, distinct child keys, orphan keys and orphan rows (child keys with
    no parent). Child side collapses to (key, n) map-side (combiner), the
    parent side to its distinct keys; ONE key-bucketed shuffle merges them
    (union-merge anti-join — Ray 2.49's native left_anti is broken, and a
    broadcast would not scale to fact-sized parents like orders), and each
    bucket emits a single partial row, so the final rollup is
    bucket-count-sized."""
    rels = [
        ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ]
    outs = []
    for name, ctab, ckey, ptab, pkey in rels:
        child = _rp(sf_dir, ctab, [ckey]).map_batches(
            lambda t, _k=ckey: t.rename_columns(["k"]),
            batch_format="pyarrow", batch_size=65536)
        ckeys = rel.partial_groupby_sum(child, ["k"], [], count_as="n",
                                        est_rows=_nrows(sf_dir, ctab))
        ckeys = ckeys.map_batches(
            lambda df: df.assign(side=np.int64(0)), batch_format="pandas")

        def _pdistinct(df: pd.DataFrame, _k=pkey) -> pd.DataFrame:
            u = np.unique(df[_k].to_numpy(np.int64))
            return pd.DataFrame({"k": u, "n": np.int64(0),
                                 "side": np.int64(1)})

        pkeys = _rp(sf_dir, ptab, [pkey]).map_batches(
            _pdistinct, batch_format="pandas", batch_size=65536)

        def _bucket_audit(df: pd.DataFrame, _name=name) -> pd.DataFrame:
            g = df.groupby("k", sort=False).agg(n=("n", "sum"),
                                                par=("side", "max"))
            is_child = g["n"].to_numpy(np.int64) > 0
            orph = is_child & (g["par"].to_numpy(np.int64) == 0)
            return pd.DataFrame({
                "relation": [_name],
                "child_rows": [np.int64(g["n"].sum())],
                "distinct_keys": [np.int64(is_child.sum())],
                "orphan_keys": [np.int64(orph.sum())],
                "orphan_rows": [np.int64(g["n"].to_numpy(np.int64)[orph].sum())],
            })

        outs.append(rel.bucketed_groups(
            ckeys.union(pkeys), ["k"], _bucket_audit,
            est_rows=_nrows(sf_dir, ctab)))
    merged = outs[0].union(*outs[1:])
    return rel.partial_groupby_sum(
        merged, ["relation"],
        ["child_rows", "distinct_keys", "orphan_keys", "orphan_rows"])


def _sql_fk_block(name: str, ctab: str, ckey: str, ptab: str, pkey: str) -> str:
    return f"""
SELECT '{name}' AS relation,
       CAST(SUM(n) AS BIGINT) AS child_rows,
       CAST(COUNT(*) AS BIGINT) AS distinct_keys,
       CAST(SUM(CASE WHEN pk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS orphan_keys,
       CAST(COALESCE(SUM(CASE WHEN pk IS NULL THEN n END), 0) AS BIGINT)
         AS orphan_rows
FROM (SELECT {ckey} AS k, COUNT(*) AS n FROM {ctab} GROUP BY 1) c
LEFT JOIN (SELECT DISTINCT {pkey} AS pk FROM {ptab}) p ON c.k = p.pk
"""


SQL_FK_INTEGRITY_AUDIT = " UNION ALL ".join([
    _sql_fk_block("lineitem->orders", "lineitem", "l_orderkey",
                  "orders", "o_orderkey"),
    _sql_fk_block("lineitem->part", "lineitem", "l_partkey",
                  "part", "p_partkey"),
    _sql_fk_block("lineitem->supplier", "lineitem", "l_suppkey",
                  "supplier", "s_suppkey"),
    _sql_fk_block("orders->customer", "orders", "o_custkey",
                  "customer", "c_custkey"),
])


def q_value_trimmed_mean(sf_dir: str):  # exact oracle (order statistics)
    """Grouped 10%-TRIMMED sum (robust location next to the exact median
    and the MAD): per (returnflag, linestatus), drop the k = n//10 lowest
    and highest price cents and sum the middle — trimming by VALUE rank,
    so the kept multiset (hence the exact sum) is tie-order-independent.
    Same holistic group-shuffled shape as ``lineitem_group_median``."""
    li = _rp(sf_dir, "lineitem",
             ["l_returnflag", "l_linestatus", "l_extendedprice"])

    def _pre(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "vc": pa.array(cents(
                batch["l_extendedprice"].to_numpy(zero_copy_only=False))),
        })

    prep = li.map_batches(_pre, batch_format="pyarrow", batch_size=16384)

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (rf, ls), g in df.groupby(["l_returnflag", "l_linestatus"],
                                      sort=False):
            v = np.sort(g["vc"].to_numpy(np.int64))
            n = len(v)
            k = n // 10
            rows.append((rf, ls, np.int64(n), np.int64(n - 2 * k),
                         np.int64(v[k:n - k].sum())))
        return pd.DataFrame(rows, columns=["l_returnflag", "l_linestatus",
                                           "n_rows", "n_kept", "trim_sum"])

    return rel.bucketed_groups(prep, ["l_returnflag", "l_linestatus"],
                               _final, est_rows=_nrows(sf_dir, "lineitem"))


SQL_VALUE_TRIMMED_MEAN = """
WITH v AS (
  SELECT l_returnflag, l_linestatus,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS vc
  FROM lineitem
),
r AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag, l_linestatus
                            ORDER BY vc) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag, l_linestatus) AS n
  FROM v
)
SELECT l_returnflag, l_linestatus, CAST(MAX(n) AS BIGINT) AS n_rows,
       CAST(MAX(n) - 2 * (MAX(n) // 10) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN rn > n // 10 AND rn <= n - n // 10
                THEN vc ELSE 0 END) AS BIGINT) AS trim_sum
FROM r GROUP BY 1, 2
"""


def q_supplier_theilsen_trend(sf_dir: str):  # exact oracle (rational median)
    """THEIL-SEN robust trend per supplier — the median of pairwise slopes
    over the 12 monthly quantity sums, immune to the outlier months that
    drag the OLS ``supplier_qty_trend``. Exact-rational trick: month gaps
    dx ∈ 1..11 all divide 27720 = lcm(1..11), so slope_key =
    dy·(27720 // dx) is an INTEGER strictly monotone in the slope dy/dx —
    ordering/median of rationals with zero float involvement. Reported as
    the two-middle sum (med2 convention) of slope keys, i.e. the median
    slope × 2·27720. Shape: one combiner-first (supp, month) rollup, then
    a supplier-bucketed pass builds the ≤66 pairs per group in-memory."""
    li = _rp(sf_dir, "lineitem", ["l_suppkey", "l_shipdate", "l_quantity"])

    def _derive(t: pa.Table) -> pa.Table:
        ts = t["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        mo = (ts.astype("datetime64[us]").astype("datetime64[M]")
              .astype(np.int64) % 12 + 1)
        return pa.table({
            "l_suppkey": t["l_suppkey"], "mo": mo,
            "q": t["l_quantity"].to_numpy(zero_copy_only=False)
                 .astype(np.int64)})

    derived = li.map_batches(_derive, batch_format="pyarrow",
                             batch_size=65536)
    monthly = rel.partial_groupby_sum(derived, ["l_suppkey", "mo"], ["q"],
                                      est_rows=_nrows(sf_dir, "lineitem"))

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for supp, g in df.groupby("l_suppkey", sort=False):
            g = g.sort_values("mo")
            mo = g["mo"].to_numpy(np.int64)
            q = g["q"].to_numpy(np.int64)
            i, j = np.triu_indices(len(mo), k=1)
            dx = mo[j] - mo[i]
            keys = np.sort((q[j] - q[i]) * (27720 // dx))
            n = len(keys)
            if n == 0:
                continue
            med2 = int(keys[(n + 1) // 2 - 1]) + int(keys[(n + 2) // 2 - 1])
            rows.append((np.int64(supp), np.int64(n), np.int64(med2)))
        return pd.DataFrame(rows, columns=["l_suppkey", "n_pairs",
                                           "ts_med2"])

    return rel.bucketed_groups(monthly, ["l_suppkey"], _final,
                               est_rows=_nrows(sf_dir, "supplier"))


SQL_SUPPLIER_THEILSEN_TREND = """
WITH m AS (
  SELECT l_suppkey, CAST(month(l_shipdate) AS BIGINT) AS mo,
         SUM(CAST(l_quantity AS BIGINT)) AS q
  FROM lineitem GROUP BY 1, 2
),
p AS (
  SELECT a.l_suppkey, (b.q - a.q) * (27720 // (b.mo - a.mo)) AS skey
  FROM m a JOIN m b ON a.l_suppkey = b.l_suppkey AND b.mo > a.mo
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY l_suppkey ORDER BY skey) AS rn,
         COUNT(*) OVER (PARTITION BY l_suppkey) AS n
  FROM p
)
SELECT l_suppkey, CAST(MAX(n) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN skey ELSE 0 END)
            + SUM(CASE WHEN rn = (n + 2) // 2 THEN skey ELSE 0 END)
            AS BIGINT) AS ts_med2
FROM r GROUP BY 1
"""


def q_events_chi2_pieces(sf_dir: str):  # exact oracle (window-sum pieces)
    """CHI-SQUARE test of independence between event_type and user segment
    (user_id % 4) — the A/B-test / drift-detection statistic — in exact
    integer PIECES: per observed cell, O and the cross-multiplied
    num_base = O·T − R·C and den = R·C·T, so χ² = Σ num_base²/den with no
    float entering the hash (same convention as the z-rule in
    ``events_anomaly``). Bound: R·C·T < 2^63 ⇒ valid to ~2M events/side
    at this segmentation — documented, fixture-safe. One combiner-first
    rollup; margins computed on the cells table (types × 4 rows)."""
    ev = _rp(sf_dir, "events", ["event_type", "user_id"])

    def _pre(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "seg": t["user_id"].to_numpy(zero_copy_only=False)
                   .astype(np.int64) % 4})

    prep = ev.map_batches(_pre, batch_format="pyarrow", batch_size=65536)
    cells = rel.partial_groupby_sum(prep, ["event_type", "seg"], [],
                                    count_as="o").to_pandas()  # types×4 rows
    total = np.int64(cells["o"].sum())
    rmap = cells.groupby("event_type")["o"].sum()
    cmap = cells.groupby("seg")["o"].sum()
    r = rmap[cells["event_type"]].to_numpy(np.int64)
    c = cmap[cells["seg"]].to_numpy(np.int64)
    o = cells["o"].to_numpy(np.int64)
    return pa.table({
        "event_type": cells["event_type"].to_numpy(),
        "seg": cells["seg"].to_numpy(np.int64),
        "o": o,
        "num_base": o * total - r * c,
        "den": r * c * total,
    })


SQL_EVENTS_CHI2_PIECES = """
WITH cells AS (
  SELECT event_type, user_id % 4 AS seg, COUNT(*) AS o
  FROM events GROUP BY 1, 2
)
SELECT event_type, seg, CAST(o AS BIGINT) AS o,
       CAST(o * SUM(o) OVER ()
            - SUM(o) OVER (PARTITION BY event_type)
              * SUM(o) OVER (PARTITION BY seg) AS BIGINT) AS num_base,
       CAST(SUM(o) OVER (PARTITION BY event_type)
            * SUM(o) OVER (PARTITION BY seg)
            * SUM(o) OVER () AS BIGINT) AS den
FROM cells
"""


def q_doc_bm25(sf_dir: str):  # exact oracle (rational BM25 pieces)
    """BM25 retrieval scoring for the query {merge, window, vector} — the
    ranking function behind every lexical search engine — with k1 = 6/5
    and b = 3/4 kept as EXACT RATIONALS: per (doc, matching term),

        tf_norm = tfn_num/tfn_den = 22·L·tf / (10·L·tf + 3·L + 9·dl·N)
        idf     = ln(idf_num/idf_den) = ln((2N − 2df + 1)/(2df + 1))

    (multiply k1/b through by 10·L: avgdl = L/N never materializes as a
    float). Pieces are emitted, not the product, so the hash is exact;
    bound 22·L·tf < 2^63 documented. Two passes over the doc-count-sized
    (doc, dl, tf…) profile: one tiny global aggregate (N, L, df), then a
    map-side emit with the scalars in the closure."""
    from ..functions.text import _WORD_ASCII_RE

    terms = ("merge", "window", "vector")
    docs = _rp(sf_dir, "documents", ["doc_id", "text"])

    def _profile(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch["text"].to_pylist()
        dl = np.empty(len(ids), dtype=np.int64)
        tfs = np.zeros((len(ids), 3), dtype=np.int64)
        for k, t in enumerate(texts):
            ws = _WORD_ASCII_RE.findall((t or "").lower())
            dl[k] = len(ws)
            for ti, term in enumerate(terms):
                tfs[k, ti] = sum(1 for w in ws if w == term)
        return pa.table({"doc_id": ids, "dl": dl, "tf_merge": tfs[:, 0],
                         "tf_window": tfs[:, 1], "tf_vector": tfs[:, 2]})

    prof = docs.map_batches(_profile, batch_format="pyarrow",
                            batch_size=1024).materialize()
    agg = prof.map_batches(
        lambda t: pa.table({
            "n": [np.int64(t.num_rows)],
            "l": [np.int64(t["dl"].to_numpy().sum())],
            **{f"df_{x}": [np.int64((t[f"tf_{x}"].to_numpy() > 0).sum())]
               for x in terms}}),
        batch_format="pyarrow").to_pandas().sum()
    n_docs, total_l = np.int64(agg["n"]), np.int64(agg["l"])
    dfs = {x: np.int64(agg[f"df_{x}"]) for x in terms}

    def _emit(t: pa.Table) -> pa.Table:
        outs = []
        ids = t["doc_id"].to_numpy()
        dl = t["dl"].to_numpy()
        for term in terms:
            tf = t[f"tf_{term}"].to_numpy()
            m = tf > 0
            df = dfs[term]
            outs.append(pa.table({
                "doc_id": ids[m],
                "term": pa.array([term] * int(m.sum()), type=pa.string()),
                "tf": tf[m],
                "tfn_num": 22 * total_l * tf[m],
                "tfn_den": 10 * total_l * tf[m] + 3 * total_l
                           + 9 * dl[m] * n_docs,
                "idf_num": np.full(int(m.sum()),
                                   2 * n_docs - 2 * df + 1, dtype=np.int64),
                "idf_den": np.full(int(m.sum()), 2 * df + 1,
                                   dtype=np.int64),
            }))
        return pa.concat_tables(outs)

    return prof.map_batches(_emit, batch_format="pyarrow", batch_size=65536)


SQL_DOC_BM25 = """
WITH ws AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[0-9a-z_]+') AS w
  FROM documents
),
d AS (
  SELECT doc_id, len(w) AS dl,
         len(list_filter(w, x -> x = 'merge')) AS tf_merge,
         len(list_filter(w, x -> x = 'window')) AS tf_window,
         len(list_filter(w, x -> x = 'vector')) AS tf_vector
  FROM ws
),
g AS (
  SELECT COUNT(*) AS n, SUM(dl) AS l,
         SUM(CASE WHEN tf_merge > 0 THEN 1 ELSE 0 END) AS df_merge,
         SUM(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS df_window,
         SUM(CASE WHEN tf_vector > 0 THEN 1 ELSE 0 END) AS df_vector
  FROM d
),
u AS (
  SELECT doc_id, dl, 'merge' AS term, tf_merge AS tf, df_merge AS df,
         n, l FROM d, g WHERE tf_merge > 0
  UNION ALL
  SELECT doc_id, dl, 'window', tf_window, df_window, n, l
  FROM d, g WHERE tf_window > 0
  UNION ALL
  SELECT doc_id, dl, 'vector', tf_vector, df_vector, n, l
  FROM d, g WHERE tf_vector > 0
)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
       CAST(22 * l * tf AS BIGINT) AS tfn_num,
       CAST(10 * l * tf + 3 * l + 9 * dl * n AS BIGINT) AS tfn_den,
       CAST(2 * n - 2 * df + 1 AS BIGINT) AS idf_num,
       CAST(2 * df + 1 AS BIGINT) AS idf_den
FROM u
"""


def q_tile_mst(sf_dir: str):  # exact oracle (round replay + recursive CC)
    """Minimum spanning FOREST of the tile kNN graph by BORŮVKA
    (``graphrank.boruvka_msf``) — the parallel-MST classic (each component
    grabs its lightest incident edge under the (w, u, v) total order,
    components contract via CC, O(log n) rounds): single-linkage
    clustering / network-skeleton primitive next to CC, BFS, SSSP and
    PageRank. The tie-break total order makes the MSF unique, so the
    oracle's round replay (per-round argmin + recursive-CTE contraction)
    and the pytest Kruskal both reproduce it bit-exactly. Emits
    (u, v, w, r) — forest edges + the round that selected them."""
    from ..stages.graphrank import boruvka_msf

    knn = q_tile_knn_graph(sf_dir)

    def _edges(t: pa.Table) -> pa.Table:
        s = t["src_tile"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["tile_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t["dist2"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = s != d
        s, d, w = s[m], d[m], w[m]
        u, v = np.minimum(s, d), np.maximum(s, d)
        df = pd.DataFrame({"u": u, "v": v, "w": w}).drop_duplicates(
            ["u", "v"])
        return pa.Table.from_pandas(df, preserve_index=False)

    edges = knn.map_batches(_edges, batch_format="pyarrow",
                            batch_size=65536)
    return boruvka_msf(edges, max_rounds=12)


def _sql_boruvka_rounds(rounds: int) -> str:
    parts = []
    for r in range(rounds):
        parts.append(f""",
x{r} AS MATERIALIZED (
  SELECT la.c AS ca, lb.c AS cb, e.w, e.u, e.v
  FROM e JOIN lab{r} la ON la.node = e.u JOIN lab{r} lb ON lb.node = e.v
  WHERE la.c <> lb.c
),
s{r} AS MATERIALIZED (
  SELECT DISTINCT u, v, w FROM (
    SELECT c, u, v, w,
           ROW_NUMBER() OVER (PARTITION BY c ORDER BY w, u, v) AS rn
    FROM (SELECT ca AS c, u, v, w FROM x{r}
          UNION ALL SELECT cb, u, v, w FROM x{r})
  ) WHERE rn = 1
),
a{r} AS MATERIALIZED (
  SELECT la.c AS ca, lb.c AS cb
  FROM s{r} s JOIN lab{r} la ON la.node = s.u
              JOIN lab{r} lb ON lb.node = s.v
  UNION
  SELECT lb.c, la.c
  FROM s{r} s JOIN lab{r} la ON la.node = s.u
              JOIN lab{r} lb ON lb.node = s.v
),
r{r} AS (
  SELECT ca AS a, ca AS m FROM a{r}
  UNION
  SELECT a{r}.cb, r{r}.m FROM r{r} JOIN a{r} ON a{r}.ca = r{r}.a
),
c{r} AS MATERIALIZED (SELECT a, MIN(m) AS root FROM r{r} GROUP BY 1),
lab{r + 1} AS MATERIALIZED (
  SELECT l.node, COALESCE(cm.root, l.c) AS c
  FROM lab{r} l LEFT JOIN c{r} cm ON cm.a = l.c
)""")
    sel = "\nUNION ALL\n".join(
        f"SELECT u, v, w, {r} AS r FROM s{r}" for r in range(rounds))
    return "".join(parts) + f"""
SELECT u, v, CAST(w AS BIGINT) AS w, CAST(r AS BIGINT) AS r FROM (
{sel}
)"""


SQL_TILE_MST = f"""
WITH RECURSIVE tiles AS ({td.TILES_SQL}),
probes AS (SELECT tile_id AS src_tile, cx AS px, cy AS py
           FROM tiles WHERE tile_id % 10 = 0),
knn AS (
  SELECT src_tile, tile_id, dist2 FROM (
    SELECT p.src_tile, t.tile_id,
           ROW_NUMBER() OVER (
             PARTITION BY p.src_tile
             ORDER BY (p.px - t.cx) * (p.px - t.cx)
                    + (p.py - t.cy) * (p.py - t.cy), t.tile_id) AS knn_rank,
           (p.px - t.cx) * (p.px - t.cx)
             + (p.py - t.cy) * (p.py - t.cy) AS dist2
    FROM probes p CROSS JOIN tiles t
  ) WHERE knn_rank <= 4
),
e AS MATERIALIZED (
  -- dist2 is symmetric, so DISTINCT collapses both orientations exactly
  SELECT DISTINCT LEAST(src_tile, tile_id) AS u,
         GREATEST(src_tile, tile_id) AS v, dist2 AS w
  FROM knn WHERE tile_id <> src_tile
),
nodes AS (SELECT u AS node FROM e UNION SELECT v FROM e),
lab0 AS MATERIALIZED (SELECT node, node AS c FROM nodes)
""" + _sql_boruvka_rounds(12)


def q_image_autocrop(sf_dir: str):  # exact oracle (planted-border closed form)
    """AUTOCROP / border-trim through the decode path
    (``media.image_autocrop``): the tightest bbox of content pixels
    (anything differing from the top-left background) — the scanned-page /
    letterbox / window-chrome trim of image curation. Fixture plants a
    constant border of width 1 + (5i mod 4) around a gradient interior
    whose channel values are multiples of 4 below 64 (fixed points of the
    QJPG quantizer, so all three formats decode bit-exactly) and never
    equal the background 60 — the bbox is therefore EXACTLY the planted
    rectangle and the oracle is the synthesis closed form. The kernel is
    the general any-channel-differs scan (pytest drives ragged content)."""
    from ..functions import codecs

    docs = _rp(sf_dir, "documents", ["doc_id"])
    fmts3 = ["bmp", "png", "jpeg"]

    def _synth(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs, fmts = [], []
        for i in ids:
            w, h = int(16 + (i % 4) * 8), int(12 + (i % 3) * 6)
            bw = int(1 + (i * 5) % 4)
            img = np.full((h, w, 3), 60, dtype=np.uint8)
            jj = np.arange(w, dtype=np.int64)
            rr = np.arange(h, dtype=np.int64)
            img[bw:h - bw, bw:w - bw, 0] = (4 * ((i + jj) % 14))[None, bw:w - bw]
            img[bw:h - bw, bw:w - bw, 1] = (4 * ((i + rr) % 14))[bw:h - bw, None]
            img[bw:h - bw, bw:w - bw, 2] = 4 * (i % 14)
            fmt = fmts3[int(i % 3)]
            blobs.append(codecs.encode(img, fmt))
            fmts.append(fmt)
        return pa.table({
            "image_id": ids,
            "bytes": pa.array(blobs, type=pa.binary()),
            "fmt": pa.array(fmts, type=pa.string()),
        })

    synth = docs.map_batches(_synth, batch_format="pyarrow", batch_size=512)
    return mstage.image_autocrop(synth, batch_size=512)


SQL_IMAGE_AUTOCROP = """
SELECT doc_id AS image_id,
       CAST(1 + (doc_id * 5) % 4 AS BIGINT) AS x0,
       CAST(1 + (doc_id * 5) % 4 AS BIGINT) AS y0,
       CAST(16 + (doc_id % 4) * 8 - 2 - (doc_id * 5) % 4 AS BIGINT) AS x1,
       CAST(12 + (doc_id % 3) * 6 - 2 - (doc_id * 5) % 4 AS BIGINT) AS y1,
       CAST((16 + (doc_id % 4) * 8 - 2 * (1 + (doc_id * 5) % 4))
            * (12 + (doc_id % 3) * 6 - 2 * (1 + (doc_id * 5) % 4))
            AS BIGINT) AS content_area
FROM documents
"""


def q_image_downscale_stats(sf_dir: str):  # exact oracle (separable replay)
    """Exact 2× BOX DOWNSAMPLE through the decode path
    (``media.image_downscale_stats``): per-image floor-mean 2×2 pyramid
    level reduced to integer checkpoints — the oracle-backed face of the
    resize op (``media.image_resize`` stays pytest-only because re-encoded
    BYTES aren't SQL-mirrorable; the downsampled PIXELS are). On the
    gradient fixture R varies only by column and G only by row, so each
    2×2 block mean collapses to a pair floor-mean along one axis and the
    (j'+1)(r'+1)-weighted sum factorizes; the kernel is the general 2-D
    block mean."""
    docs = _rp(sf_dir, "documents", ["doc_id"])

    synth = docs.map_batches(_image_fixture_synth, batch_format="pyarrow", batch_size=512)
    return mstage.image_downscale_stats(synth, batch_size=512)


SQL_IMAGE_DOWNSCALE_STATS = """
WITH im AS (
  SELECT doc_id AS image_id,
         16 + (doc_id % 4) * 8 AS w, 12 + (doc_id % 3) * 6 AS h,
         doc_id % 3 AS fi,
         (doc_id * 7) % 200 AS br, (doc_id * 11) % 200 AS bg
  FROM documents
),
rq AS (
  SELECT image_id, j,
         CASE WHEN fi = 2
              THEN ((br + (j * 55) // (w - 1)) // 4) * 4
                   + ((br + (j * 55) // (w - 1)) // 4) // 16
              ELSE br + (j * 55) // (w - 1) END AS v
  FROM im, (SELECT unnest(range(40)) AS j) js WHERE j < w
),
rp AS (
  SELECT a.image_id, a.j // 2 AS jp, (a.v + b.v) // 2 AS dv
  FROM rq a JOIN rq b ON a.image_id = b.image_id AND b.j = a.j + 1
  WHERE a.j % 2 = 0
),
rs AS (
  SELECT image_id, SUM(dv) AS s, SUM((jp + 1) * dv) AS ws
  FROM rp GROUP BY image_id
),
gq AS (
  SELECT image_id, r,
         CASE WHEN fi = 2
              THEN ((bg + (r * 41) // (h - 1)) // 4) * 4
                   + ((bg + (r * 41) // (h - 1)) // 4) // 16
              ELSE bg + (r * 41) // (h - 1) END AS v
  FROM im, (SELECT unnest(range(24)) AS r) rs2 WHERE r < h
),
gp AS (
  SELECT a.image_id, a.r // 2 AS rp2, (a.v + b.v) // 2 AS dv
  FROM gq a JOIN gq b ON a.image_id = b.image_id AND b.r = a.r + 1
  WHERE a.r % 2 = 0
),
gs AS (
  SELECT image_id, SUM(dv) AS s, SUM((rp2 + 1) * dv) AS ws
  FROM gp GROUP BY image_id
)
SELECT im.image_id,
       CAST(w // 2 AS BIGINT) AS dw, CAST(h // 2 AS BIGINT) AS dh,
       CAST((h // 2) * rs.s AS BIGINT) AS r_sum,
       CAST(((h // 2) * (h // 2 + 1) // 2) * rs.ws AS BIGINT) AS r_wsum,
       CAST((w // 2) * gs.s AS BIGINT) AS g_sum,
       CAST(((w // 2) * (w // 2 + 1) // 2) * gs.ws AS BIGINT) AS g_wsum
FROM im JOIN rs USING (image_id) JOIN gs USING (image_id)
"""


def q_image_rle_profile(sf_dir: str):  # exact oracle (1-D LAG replay)
    """RLE COMPRESSIBILITY profile through the decode path
    (``media.image_rle_profile``): run-length token counts (horizontal R,
    vertical G, horizontal B) — the synthetic-vs-photographic screen of
    image curation (diagrams/screenshots RLE to a handful of tokens per
    scanline, photographs don't). On the gradient fixture every R row is
    identical, so the oracle is h × a 1-D LAG change count (and w × for
    the row-driven G, h × 1 for the constant B); the kernel is the
    general 2-D neighbor-change count."""
    docs = _rp(sf_dir, "documents", ["doc_id"])

    synth = docs.map_batches(_image_fixture_synth, batch_format="pyarrow", batch_size=512)
    return mstage.image_rle_profile(synth, batch_size=512)


SQL_IMAGE_RLE_PROFILE = """
WITH im AS (
  SELECT doc_id AS image_id,
         16 + (doc_id % 4) * 8 AS w, 12 + (doc_id % 3) * 6 AS h,
         doc_id % 3 AS fi,
         (doc_id * 7) % 200 AS br, (doc_id * 11) % 200 AS bg
  FROM documents
),
rq AS (
  SELECT image_id, j,
         CASE WHEN fi = 2
              THEN ((br + (j * 55) // (w - 1)) // 4) * 4
                   + ((br + (j * 55) // (w - 1)) // 4) // 16
              ELSE br + (j * 55) // (w - 1) END AS v
  FROM im, (SELECT unnest(range(40)) AS j) js WHERE j < w
),
rruns AS (
  SELECT image_id,
         1 + SUM(CASE WHEN pv IS NOT NULL AND v <> pv THEN 1 ELSE 0 END)
           AS runs
  FROM (SELECT image_id, v,
               LAG(v) OVER (PARTITION BY image_id ORDER BY j) AS pv
        FROM rq)
  GROUP BY image_id
),
gq AS (
  SELECT image_id, r,
         CASE WHEN fi = 2
              THEN ((bg + (r * 41) // (h - 1)) // 4) * 4
                   + ((bg + (r * 41) // (h - 1)) // 4) // 16
              ELSE bg + (r * 41) // (h - 1) END AS v
  FROM im, (SELECT unnest(range(24)) AS r) rs2 WHERE r < h
),
gruns AS (
  SELECT image_id,
         1 + SUM(CASE WHEN pv IS NOT NULL AND v <> pv THEN 1 ELSE 0 END)
           AS runs
  FROM (SELECT image_id, v,
               LAG(v) OVER (PARTITION BY image_id ORDER BY r) AS pv
        FROM gq)
  GROUP BY image_id
)
SELECT im.image_id,
       CAST(h * rruns.runs AS BIGINT) AS r_runs_h,
       CAST(w * gruns.runs AS BIGINT) AS g_runs_v,
       CAST(h AS BIGINT) AS b_runs_h
FROM im JOIN rruns USING (image_id) JOIN gruns USING (image_id)
"""


def q_image_grad_orientation(sf_dir: str):  # exact oracle (1-D x 1-D octants)
    """GRADIENT-ORIENTATION octant histogram (HOG-lite) through the decode
    path (``media.image_grad_orientation``): central-difference dx/dy of
    the luma sum R+G+B on interior pixels, the classic 8-octant
    sign/|dx|-vs-|dy| comparison tree (no atan2 — integer-exact), one
    count column per octant plus the flat (zero-gradient) count — the
    edge-direction texture signature of synthetic-vs-photo screening. On
    the factorized fixture dx depends only on the column (the R h-gradient;
    G and B cancel in the difference) and dy only on the row, so the
    oracle is a cross join of two 1-D difference grids; the kernel is the
    general 2-D tree."""
    docs = _rp(sf_dir, "documents", ["doc_id"])

    synth = docs.map_batches(_image_fixture_synth, batch_format="pyarrow", batch_size=512)
    return mstage.image_grad_orientation(synth, batch_size=512)


SQL_IMAGE_GRAD_ORIENTATION = """
WITH im AS (
  SELECT doc_id AS image_id,
         16 + (doc_id % 4) * 8 AS w, 12 + (doc_id % 3) * 6 AS h,
         doc_id % 3 AS fi,
         (doc_id * 7) % 200 AS br, (doc_id * 11) % 200 AS bg
  FROM documents
),
rq AS (  -- dequantized R value per column (jpeg -> QJPG bin centers)
  SELECT image_id, j,
         CASE WHEN fi = 2
              THEN ((br + (j * 55) // (w - 1)) // 4) * 4
                   + ((br + (j * 55) // (w - 1)) // 4) // 16
              ELSE br + (j * 55) // (w - 1) END AS v
  FROM im, (SELECT unnest(range(40)) AS j) js WHERE j < w
),
gq AS (
  SELECT image_id, r,
         CASE WHEN fi = 2
              THEN ((bg + (r * 41) // (h - 1)) // 4) * 4
                   + ((bg + (r * 41) // (h - 1)) // 4) // 16
              ELSE bg + (r * 41) // (h - 1) END AS v
  FROM im, (SELECT unnest(range(24)) AS r) rs2 WHERE r < h
),
dxs AS (  -- central difference over interior columns (G,B cancel)
  SELECT a.image_id, a.j - 1 AS x, a.v - b.v AS dx
  FROM rq a JOIN rq b ON b.image_id = a.image_id AND b.j = a.j - 2
),
dys AS (
  SELECT a.image_id, a.r - 1 AS y, a.v - b.v AS dy
  FROM gq a JOIN gq b ON b.image_id = a.image_id AND b.r = a.r - 2
),
px AS (
  SELECT dxs.image_id, dx, dy,
         CASE WHEN dx = 0 AND dy = 0 THEN -1
              WHEN dy >= 0 AND dx >= 0 AND ABS(dy) <= ABS(dx) THEN 0
              WHEN dy >= 0 AND dx >= 0 THEN 1
              WHEN dy >= 0 AND dx < 0 AND ABS(dy) > ABS(dx) THEN 2
              WHEN dy >= 0 THEN 3
              WHEN dx < 0 AND ABS(dy) <= ABS(dx) THEN 4
              WHEN dx < 0 THEN 5
              WHEN ABS(dy) > ABS(dx) THEN 6
              ELSE 7 END AS oct
  FROM dxs JOIN dys ON dys.image_id = dxs.image_id
)
SELECT image_id,
       CAST(SUM(CASE WHEN oct = -1 THEN 1 ELSE 0 END) AS BIGINT) AS flat_n,
       CAST(SUM(CASE WHEN oct = 0 THEN 1 ELSE 0 END) AS BIGINT) AS oct0,
       CAST(SUM(CASE WHEN oct = 1 THEN 1 ELSE 0 END) AS BIGINT) AS oct1,
       CAST(SUM(CASE WHEN oct = 2 THEN 1 ELSE 0 END) AS BIGINT) AS oct2,
       CAST(SUM(CASE WHEN oct = 3 THEN 1 ELSE 0 END) AS BIGINT) AS oct3,
       CAST(SUM(CASE WHEN oct = 4 THEN 1 ELSE 0 END) AS BIGINT) AS oct4,
       CAST(SUM(CASE WHEN oct = 5 THEN 1 ELSE 0 END) AS BIGINT) AS oct5,
       CAST(SUM(CASE WHEN oct = 6 THEN 1 ELSE 0 END) AS BIGINT) AS oct6,
       CAST(SUM(CASE WHEN oct = 7 THEN 1 ELSE 0 END) AS BIGINT) AS oct7
FROM px GROUP BY image_id
"""


def q_image_bayer_dither(sf_dir: str):  # exact oracle (residue-class counts)
    """4×4 BAYER ORDERED DITHER black-pixel counts per channel through the
    decode path (``media.image_bayer_dither``): pixel dithers black iff
    v // 16 <= B(y % 4, x % 4) — the 1-bit-display / thumbnail-ink
    estimate, and the parallel-safe member of the dithering family (error
    diffusion is inherently sequential; the ordered matrix is why this one
    distributes). Each fixture channel varies along one axis, so the
    oracle collapses the tiled threshold into residue-class row/column
    counts ((h + 3 − m) // 4 rows have y % 4 = m) instead of an h×w join;
    the kernel is the general 2-D compare."""
    docs = _rp(sf_dir, "documents", ["doc_id"])

    synth = docs.map_batches(_image_fixture_synth, batch_format="pyarrow", batch_size=512)
    return mstage.image_bayer_dither(synth, batch_size=512)


SQL_IMAGE_BAYER_DITHER = """
WITH """ + _SQL_IM3 + """,
bayer(m, k, t) AS (VALUES
  (0,0,0),(0,1,8),(0,2,2),(0,3,10),
  (1,0,12),(1,1,4),(1,2,14),(1,3,6),
  (2,0,3),(2,1,11),(2,2,1),(2,3,9),
  (3,0,15),(3,1,7),(3,2,13),(3,3,5)
),
rq AS (
  SELECT image_id, j, h,
         CASE WHEN fi = 2
              THEN (((br + (j * 55) // (w - 1)) // 4) * 4
                    + ((br + (j * 55) // (w - 1)) // 4) // 16) // 16
              ELSE (br + (j * 55) // (w - 1)) // 16 END AS q
  FROM im, (SELECT unnest(range(40)) AS j) js WHERE j < w
),
gq AS (
  SELECT image_id, r, w,
         CASE WHEN fi = 2
              THEN (((bg + (r * 41) // (h - 1)) // 4) * 4
                    + ((bg + (r * 41) // (h - 1)) // 4) // 16) // 16
              ELSE (bg + (r * 41) // (h - 1)) // 16 END AS q
  FROM im, (SELECT unnest(range(24)) AS r) rs2 WHERE r < h
),
blk_r AS (  -- R varies by column: weight each (column, row-residue) pair
  SELECT image_id,
         SUM(CASE WHEN q <= t THEN (h + 3 - m) // 4 ELSE 0 END) AS n
  FROM rq JOIN bayer ON bayer.k = rq.j % 4
  GROUP BY image_id
),
blk_g AS (
  SELECT image_id,
         SUM(CASE WHEN q <= t THEN (w + 3 - k) // 4 ELSE 0 END) AS n
  FROM gq JOIN bayer ON bayer.m = gq.r % 4
  GROUP BY image_id
),
blk_b AS (  -- constant channel: all 16 residue classes at once
  SELECT image_id,
         SUM(CASE WHEN (CASE WHEN fi = 2
                             THEN ((bb // 4) * 4 + (bb // 4) // 16) // 16
                             ELSE bb // 16 END) <= t
                  THEN ((h + 3 - m) // 4) * ((w + 3 - k) // 4)
                  ELSE 0 END) AS n
  FROM im, bayer
  GROUP BY image_id
)
SELECT im.image_id,
       CAST(blk_r.n AS BIGINT) AS black_r,
       CAST(blk_g.n AS BIGINT) AS black_g,
       CAST(blk_b.n AS BIGINT) AS black_b
FROM im JOIN blk_r USING (image_id) JOIN blk_g USING (image_id)
        JOIN blk_b USING (image_id)
"""


def q_points_quadtree(sf_dir: str):  # exact oracle (per-depth rollup replay)
    """Adaptive QUADTREE bulk build over the probe points
    (``spatial.quadtree_leaves``): split a quadrant while it holds more
    than 256 points, depth floor 8 — one row per occupied leaf
    (depth, qx, qy, n_points). The tiling-service twin of
    ``points_str_pack`` and the adaptive form of the reference's
    geo-proximity key prefix (`getGeoProximityKey.js:8-46`). One
    value-domain-bounded combiner shuffle (counts at depth 8); the rollup
    and leaf rule run on that <= 65536-row table."""
    pts = conflation.read_points(sf_dir)
    return spatial.quadtree_leaves(pts, "px", "py", cap=256, max_depth=8,
                                   est_rows=_nrows(sf_dir, "lineitem"))


def _qt_sql() -> str:
    ctes = ["c8 AS (SELECT px // 256 AS qx, py // 256 AS qy, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM points GROUP BY 1, 2)"]
    for d in range(7, -1, -1):
        ctes.append(
            f"c{d} AS (SELECT qx // 2 AS qx, qy // 2 AS qy, SUM(n) AS n "
            f"FROM c{d + 1} GROUP BY 1, 2)")
    unions = ["SELECT 0 AS depth, qx, qy, n FROM c0 WHERE n <= 256"]
    for d in range(1, 8):
        unions.append(
            f"SELECT {d}, c.qx, c.qy, c.n FROM c{d} c "
            f"JOIN c{d - 1} p ON p.qx = c.qx // 2 AND p.qy = c.qy // 2 "
            f"WHERE c.n <= 256 AND p.n > 256")
    unions.append(
        "SELECT 8, c.qx, c.qy, c.n FROM c8 c "
        "JOIN c7 p ON p.qx = c.qx // 2 AND p.qy = c.qy // 2 "
        "WHERE p.n > 256")
    return (_CTES + ", " + ",\n".join(ctes)
            + "\nSELECT CAST(depth AS BIGINT) AS depth, qx, qy, "
              "CAST(n AS BIGINT) AS n_points FROM (\n"
            + "\nUNION ALL\n".join(unions) + "\n)")


SQL_POINTS_QUADTREE = _qt_sql()


# fixed query bbox for the z-order range scan (inclusive; 16-aligned edges
# keep the decomposition O(perimeter / 16) without changing its semantics)
_MRS = (11104, 44447, 22208, 53327)


def q_morton_range_scan(sf_dir: str):  # exact oracle (recursive descent CTE)
    """Z-ORDER RANGE SCAN: answer a bbox query through the Morton key only
    (``spatial.morton_range_scan``): BIGMIN-style quadtree descent
    decomposes the box into disjoint morton intervals, each probed with a
    searchsorted per batch — the read-pruning primitive of a
    Morton-sorted 100 TB layout (each interval = a contiguous file span).
    Emits (lo, hi, n_points) per interval INCLUDING empties: the
    decomposition itself is under test. Oracle: the identical descent as
    a recursive CTE + the bit-spread ladder + a BETWEEN range join."""
    pts = conflation.read_points(sf_dir)
    x0, x1, y0, y1 = _MRS
    return spatial.morton_range_scan(pts, x0, x1, y0, y1,
                                     est_rows=_nrows(sf_dir, "lineitem"))


def _mrs_sql() -> str:
    x0, x1, y0, y1 = _MRS
    cx0, cx1 = "(qx << (16 - d))", "(((qx + 1) << (16 - d)) - 1)"
    cy0, cy1 = "(qy << (16 - d))", "(((qy + 1) << (16 - d)) - 1)"
    inside = (f"({cx0} >= {x0} AND {cx1} <= {x1} "
              f"AND {cy0} >= {y0} AND {cy1} <= {y1})")
    disjoint = (f"({cx1} < {x0} OR {cx0} > {x1} "
                f"OR {cy1} < {y0} OR {cy0} > {y1})")
    spread = """
{p}1 AS (SELECT {keep}, (({v} | ({v} << 16)) & 281470681808895) AS a FROM {src}),
{p}2 AS (SELECT {keep}, ((a | (a << 8)) & 71777214294589695) AS b FROM {p}1),
{p}3 AS (SELECT {keep}, ((b | (b << 4)) & 1085102592571150095) AS c FROM {p}2),
{p}4 AS (SELECT {keep}, ((c | (c << 2)) & 3689348814741910323) AS dd FROM {p}3),
{p}5 AS (SELECT {keep}, ((dd | (dd << 1)) & 6148914691236517205) AS sp FROM {p}4)"""
    return _CTES.replace("WITH ", "WITH RECURSIVE ", 1) + f""",
part(d, qx, qy) AS (
  SELECT 0, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
  UNION ALL
  SELECT d, qx, qy FROM (
    SELECT p.d + 1 AS d, p.qx * 2 + ci % 2 AS qx, p.qy * 2 + ci // 2 AS qy
    FROM part p, (SELECT unnest(range(4)) AS ci) ch
    WHERE p.d < 16
  ) WHERE NOT {inside} AND NOT {disjoint}
),
leafq AS (
  SELECT ROW_NUMBER() OVER (ORDER BY d, qx, qy) AS cid, d,
         qx << (16 - d) AS x0, qy << (16 - d) AS y0
  FROM (
    SELECT p.d + 1 AS d, p.qx * 2 + ci % 2 AS qx, p.qy * 2 + ci // 2 AS qy
    FROM part p, (SELECT unnest(range(4)) AS ci) ch
  ) WHERE {inside}
),{spread.format(p='lx', keep='cid, d, y0', v='x0', src='leafq')},{spread.format(p='ly', keep='cid, d, xs', v='y0',
               src='(SELECT cid, d, sp AS xs, y0 FROM lx5)')},
iv AS (
  SELECT (xs | (sp << 1)) AS lo,
         (xs | (sp << 1)) + ((CAST(1 AS BIGINT) << (2 * (16 - d))) - 1) AS hi
  FROM ly5
),{spread.format(p='px', keep='py', v='px', src='points')},{spread.format(p='py_', keep='xs', v='py',
               src='(SELECT sp AS xs, py FROM px5)')},
pc AS (SELECT (xs | (sp << 1)) AS code FROM py_5)
SELECT iv.lo, iv.hi, CAST(COUNT(pc.code) AS BIGINT) AS n_points
FROM iv LEFT JOIN pc ON pc.code BETWEEN iv.lo AND iv.hi
GROUP BY iv.lo, iv.hi
"""


SQL_MORTON_RANGE_SCAN = _mrs_sql()


def q_grid_flow_d8(sf_dir: str):  # exact oracle (argmin rank + round joins)
    """D8 FLOW ROUTING over the probe-point density raster
    (``spatial.grid_flow_d8``): steepest-rational-descent direction per
    occupied cell (cardinal drop×99 vs diagonal drop×70 — the classic
    rational √2; ties to the smallest code; pits −1) plus 6 synchronous
    rounds of flow accumulation (bounded-horizon upslope area) — the
    hydrology/DEM sibling of `grid_slope_aspect` and `tile_isochrone`."""
    pts = conflation.read_points(sf_dir)
    return spatial.grid_flow_d8(pts, "px", "py", cell=1024, rounds=6,
                                est_rows=_nrows(sf_dir, "lineitem"))


def _flow_sql(rounds: int = 6) -> str:
    nl = ",\n"
    accs = ["a0 AS (SELECT cx, cy, CAST(1 AS BIGINT) AS acc FROM dir)"]
    for t in range(1, rounds + 1):
        accs.append(
            f"a{t} AS (SELECT d.cx, d.cy, 1 + COALESCE(SUM(p.acc), 0) AS acc"
            f" FROM dir d LEFT JOIN dir s ON s.tx = d.cx AND s.ty = d.cy"
            f" LEFT JOIN a{t - 1} p ON p.cx = s.cx AND p.cy = s.cy"
            f" GROUP BY d.cx, d.cy)")
    return _CTES + f""",
cells AS (
  SELECT px // 1024 AS cx, py // 1024 AS cy, CAST(COUNT(*) AS BIGINT) AS v
  FROM points GROUP BY 1, 2
),
d8(code, dx, dy, num) AS (VALUES
  (0, 1, 0, 99), (1, 1, 1, 70), (2, 0, 1, 99), (3, -1, 1, 70),
  (4, -1, 0, 99), (5, -1, -1, 70), (6, 0, -1, 99), (7, 1, -1, 70)
),
nb AS (
  SELECT b.cx, b.cy, b.v, d8.code, d8.dx, d8.dy,
         b.v - COALESCE(n.v, 0) AS drp,
         (b.v - COALESCE(n.v, 0)) * d8.num AS key
  FROM cells b CROSS JOIN d8
  LEFT JOIN cells n ON n.cx = b.cx + d8.dx AND n.cy = b.cy + d8.dy
),
rk AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY cx, cy
             ORDER BY CASE WHEN drp > 0 THEN 0 ELSE 1 END, key DESC, code)
           AS rn
  FROM nb
),
dir AS (
  SELECT cx, cy, v,
         CASE WHEN drp > 0 THEN code ELSE -1 END AS dir,
         CASE WHEN drp > 0 THEN cx + dx END AS tx,
         CASE WHEN drp > 0 THEN cy + dy END AS ty
  FROM rk WHERE rn = 1
),
{nl.join(accs)}
SELECT dir.cx, dir.cy, dir.v, CAST(dir.dir AS BIGINT) AS dir,
       CAST(a{rounds}.acc AS BIGINT) AS acc
FROM dir JOIN a{rounds} ON a{rounds}.cx = dir.cx AND a{rounds}.cy = dir.cy
"""


SQL_GRID_FLOW_D8 = _flow_sql(6)


def q_image_seam_energy(sf_dir: str):  # exact oracle (list-DP recursive CTE)
    """SEAM-CARVING minimum-energy vertical path per image through the
    decode path (``media.image_seam_energy``): the content-aware-resize DP
    M[i][j] = e[i][j] + min(M[i−1][j−1..j+1]) over the interior energy
    grid e = |dx| + |dy| of the luma sum — integer-exact, 8-connected.
    On the factorized fixture e(i, j) = a(j) + b(i) (dx cancels G/B, dy
    cancels R/B), so the oracle carries the whole DP row as a LIST through
    a recursive CTE (the same vector-in-CTE device as `path_dijkstra`);
    the kernel is the general 2-D DP."""
    docs = _rp(sf_dir, "documents", ["doc_id"])

    synth = docs.map_batches(_image_fixture_synth, batch_format="pyarrow", batch_size=512)
    return mstage.image_seam_energy(synth, batch_size=512)


def _seam_sql() -> str:
    def dq(expr: str) -> str:
        return (f"CASE WHEN fi = 2 THEN (({expr}) // 4) * 4"
                f" + (({expr}) // 4) // 16 ELSE {expr} END")

    rv = dq("br + (({x}) * 55) // (w - 1)")
    gv = dq("bg + (({y}) * 41) // (h - 1)")
    a_j = (f"ABS(({rv.format(x='j + 2')}) - ({rv.format(x='j')}))")
    b_i = (f"ABS(({gv.format(y=' i2 + 2')}) - ({gv.format(y=' i2')}))")
    return f"""
WITH RECURSIVE im AS (
  SELECT doc_id AS image_id,
         16 + (doc_id % 4) * 8 AS w, 12 + (doc_id % 3) * 6 AS h,
         doc_id % 3 AS fi,
         (doc_id * 7) % 200 AS br, (doc_id * 11) % 200 AS bg
  FROM documents
),
base AS (
  SELECT image_id, w - 2 AS wi, h - 2 AS hi,
         list_transform(range(w - 2), j -> {a_j}) AS A,
         list_transform(range(h - 2), i2 -> {b_i}) AS B
  FROM im
),
dp AS (
  SELECT image_id, wi, hi, A, B, 0 AS i,
         list_transform(range(wi), j -> A[j + 1] + B[1]) AS m
  FROM base
  UNION ALL
  SELECT image_id, wi, hi, A, B, i + 1,
         list_transform(range(wi), j -> A[j + 1] + B[i + 2] + least(
           m[CASE WHEN j = 0 THEN 1 ELSE j END],
           m[j + 1],
           m[CASE WHEN j = wi - 1 THEN wi ELSE j + 2 END]))
  FROM dp WHERE i < hi - 1
)
SELECT image_id,
       CAST(list_min(m) AS BIGINT) AS seam_cost,
       CAST(list_position(m, list_min(m)) - 1 AS BIGINT) AS seam_end,
       CAST(hi * list_sum(A) + wi * list_sum(B) AS BIGINT) AS e_total
FROM dp WHERE i = hi - 1
"""


SQL_IMAGE_SEAM_ENERGY = _seam_sql()


def q_tile_matching(sf_dir: str):  # exact oracle (round replay)
    """MAXIMAL MATCHING of the tile kNN graph by locally-dominant edges
    (``graphrank.greedy_matching``, Preis / Manne-Bisseling): per round an
    edge is selected iff it is the (w, u, v)-minimum live edge at BOTH
    endpoints; matched tiles retire. With the strict total order this
    EQUALS sequential greedy matching (pytest proves it), making it the
    one-to-one assignment core of conflation — 'pair each segment with at
    most one counterpart, lightest conflict wins' — next to MST/CC/SSSP
    in the distributed-graph set. Emits (u, v, w, r)."""
    from ..stages.graphrank import greedy_matching

    knn = q_tile_knn_graph(sf_dir)

    def _edges(t: pa.Table) -> pa.Table:
        s = t["src_tile"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["tile_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t["dist2"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = s != d
        s, d, w = s[m], d[m], w[m]
        u, v = np.minimum(s, d), np.maximum(s, d)
        df = pd.DataFrame({"u": u, "v": v, "w": w}).drop_duplicates(
            ["u", "v"])
        return pa.Table.from_pandas(df, preserve_index=False)

    edges = knn.map_batches(_edges, batch_format="pyarrow",
                            batch_size=65536)
    return greedy_matching(edges, max_rounds=12)


def _sql_matching_rounds(rounds: int) -> str:
    parts = [""",
mat0 AS (SELECT CAST(NULL AS BIGINT) AS node WHERE 1 = 0)"""]
    for r in range(rounds):
        parts.append(f""",
lv{r} AS MATERIALIZED (
  SELECT e.u, e.v, e.w FROM e
  WHERE e.u NOT IN (SELECT node FROM mat{r})
    AND e.v NOT IN (SELECT node FROM mat{r})
),
vm{r} AS MATERIALIZED (
  SELECT u, v, w FROM (
    SELECT x, u, v, w,
           ROW_NUMBER() OVER (PARTITION BY x ORDER BY w, u, v) AS rn
    FROM (SELECT u AS x, u, v, w FROM lv{r}
          UNION ALL SELECT v, u, v, w FROM lv{r})
  ) WHERE rn = 1
),
s{r} AS MATERIALIZED (
  SELECT u, v, w FROM vm{r} GROUP BY u, v, w HAVING COUNT(*) = 2
),
mat{r + 1} AS MATERIALIZED (
  SELECT node FROM mat{r}
  UNION SELECT u FROM s{r} UNION SELECT v FROM s{r}
)""")
    sel = "\nUNION ALL\n".join(
        f"SELECT u, v, w, {r} AS r FROM s{r}" for r in range(rounds))
    return "".join(parts) + f"""
SELECT u, v, CAST(w AS BIGINT) AS w, CAST(r AS BIGINT) AS r FROM (
{sel}
)"""


SQL_TILE_MATCHING = f"""
WITH tiles AS ({td.TILES_SQL}),
probes AS (SELECT tile_id AS src_tile, cx AS px, cy AS py
           FROM tiles WHERE tile_id % 10 = 0),
knn AS (
  SELECT src_tile, tile_id, dist2 FROM (
    SELECT p.src_tile, t.tile_id,
           ROW_NUMBER() OVER (
             PARTITION BY p.src_tile
             ORDER BY (p.px - t.cx) * (p.px - t.cx)
                    + (p.py - t.cy) * (p.py - t.cy), t.tile_id) AS knn_rank,
           (p.px - t.cx) * (p.px - t.cx)
             + (p.py - t.cy) * (p.py - t.cy) AS dist2
    FROM probes p CROSS JOIN tiles t
  ) WHERE knn_rank <= 4
),
e AS MATERIALIZED (
  SELECT DISTINCT LEAST(src_tile, tile_id) AS u,
         GREATEST(src_tile, tile_id) AS v, dist2 AS w
  FROM knn WHERE tile_id <> src_tile
)""" + _sql_matching_rounds(12)


def q_embedding_power_iteration(sf_dir: str):  # exact oracle (round joins)
    """Dominant-eigenvector POWER ITERATION over the embedding Gram matrix
    (``ann.power_iteration``) — the PCA-direction / spectral primitive as
    exact integers: the distributed piece is the dim²-bounded Gram
    combiner (fixed-point 1e3 so the iteration fits int64); then 6
    deterministic steps y = G·x, x ← trunc(y·8192 / max|y|) with
    TRUNCATING division (SQL ``//`` semantics — documented; numpy floors,
    so the kernel truncates explicitly). No floats, no tolerance."""
    emb = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ann.power_iteration(emb, dim=64, rounds=6, scale=1000)


def _power_sql(rounds: int = 6) -> str:
    steps = ["x0 AS (SELECT unnest(range(64)) AS d, CAST(1 AS BIGINT) AS xv)"]
    for t in range(1, rounds + 1):
        steps.append(
            f"y{t} AS (SELECT g.i AS d, SUM(g.gram * x{t - 1}.xv) AS yv"
            f" FROM g JOIN x{t - 1} ON x{t - 1}.d = g.j GROUP BY 1)")
        steps.append(
            f"x{t} AS (SELECT d, (yv * 8192)"
            f" // GREATEST((SELECT MAX(ABS(yv)) FROM y{t}), 1) AS xv"
            f" FROM y{t})")
    nl = ",\n"
    return f"""
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
         CAST(FLOOR(unnest(embedding) * 1e3 + 0.5) AS BIGINT) AS v
  FROM embeddings
),
g AS MATERIALIZED (
  SELECT a.d AS i, b.d AS j, SUM(a.v * b.v) AS gram
  FROM q a JOIN q b USING (vec_id)
  GROUP BY a.d, b.d
),
{nl.join(steps)}
SELECT CAST(d AS BIGINT) AS d, CAST(xv AS BIGINT) AS xv FROM x{rounds}
"""


SQL_EMBEDDING_POWER_ITERATION = _power_sql(6)


def q_grid_flow_basins(sf_dir: str):  # exact oracle (doubling self-joins)
    """WATERSHED basin labeling over the D8 flow forest
    (``spatial.grid_flow_basins``): every occupied raster cell follows its
    steepest-descent direction to its TERMINAL (pit or last occupied cell
    before the flow exits the raster) by POINTER DOUBLING — succ ← succ∘
    succ, 7 rounds covering chains up to 128 (PRAM list ranking, same
    device as `part_hierarchy_rollup`). The basin partition companion of
    `grid_flow_d8`'s accumulation. Oracle: the identical direction CTE +
    7 unrolled self-joins of the successor map."""
    pts = conflation.read_points(sf_dir)
    return spatial.grid_flow_basins(pts, "px", "py", cell=1024,
                                    doublings=7,
                                    est_rows=_nrows(sf_dir, "lineitem"))


def _basin_sql(doublings: int = 7) -> str:
    base = _flow_sql(0)  # reuse the direction CTEs; 0 accumulation rounds
    head = base[:base.index(",\na0 AS ")]
    steps = ["""
s0 AS MATERIALIZED (
  SELECT d.cx, d.cy,
         CASE WHEN t.cx IS NOT NULL THEN d.tx ELSE d.cx END AS sx,
         CASE WHEN t.cy IS NOT NULL THEN d.ty ELSE d.cy END AS sy
  FROM dir d LEFT JOIN dir t ON t.cx = d.tx AND t.cy = d.ty
)"""]
    for k in range(1, doublings + 1):
        steps.append(f"""
s{k} AS MATERIALIZED (
  SELECT a.cx, a.cy, b.sx, b.sy
  FROM s{k - 1} a JOIN s{k - 1} b ON b.cx = a.sx AND b.cy = a.sy
)""")
    return (head + "," + ",".join(steps)
            + f"\nSELECT cx, cy, sx AS bx, sy AS by FROM s{doublings}\n")


SQL_GRID_FLOW_BASINS = _basin_sql(7)


def q_events_runs_test(sf_dir: str):  # exact oracle (window LAG run starts)
    """WALD-WOLFOWITZ RUNS TEST per event type: sign of each value against
    the type's lower median (ties dropped, the classic convention), runs =
    number of maximal same-sign stretches in (ts, event_id) order — the
    randomness/clustering check of a monitoring pipeline (too few runs =
    regime drift, too many = oscillation). Distribution shape: the median
    comes from a value-domain-bounded count table; the ordered scan is the
    pack_sequences block-summary monoid — per (type, day-bucket) groups
    emit ONE summary row (first/last sign, internal run starts, counts)
    and the driver merges the ≤ #days summaries in order."""
    ev = _rp(sf_dir, "events", ["event_type", "value", "ts", "event_id"])

    def _cnt(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "v": cents(batch["value"].to_numpy(zero_copy_only=False)),
        })

    counts = rel.partial_groupby_sum(
        ev.map_batches(_cnt, batch_format="pyarrow", batch_size=65536),
        ["event_type", "v"], [], count_as="c").to_pandas()
    counts = counts.sort_values(["event_type", "v"])
    med: dict[str, int] = {}
    for t, g in counts.groupby("event_type", sort=False):
        cum = g["c"].to_numpy(np.int64).cumsum()
        n = int(cum[-1])
        rank = (n + 1) // 2
        med[t] = int(g["v"].to_numpy(np.int64)[np.searchsorted(cum, rank)])
    med_ref = ray.put(med)

    DAY_US = 86_400_000_000

    def _signs(batch: pa.Table) -> pa.Table:
        from ..stages.util import cached_state

        m = cached_state(med_ref, lambda d: d, token="runs_test.medians")
        t = batch["event_type"].to_numpy(zero_copy_only=False)
        v = cents(batch["value"].to_numpy(zero_copy_only=False))
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mv = np.array([m[x] for x in t], np.int64)
        sg = np.sign(v - mv).astype(np.int64)
        keep = sg != 0
        return pa.table({
            "event_type": pa.array(t[keep]),
            "b": ts[keep] // DAY_US,
            "ts": ts[keep], "event_id": eid[keep], "sg": sg[keep],
        })

    signs = ev.map_batches(_signs, batch_format="pyarrow", batch_size=65536)

    def _summary(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (t, b), gg in g.groupby(["event_type", "b"], sort=False):
            gg = gg.sort_values(["ts", "event_id"], kind="mergesort")
            s = gg["sg"].to_numpy(np.int64)
            rows.append((t, int(b), int(s[0]), int(s[-1]),
                         int((s[1:] != s[:-1]).sum()),
                         int((s == 1).sum()), int((s == -1).sum())))
        return pd.DataFrame(rows, columns=["event_type", "b", "first",
                                           "last", "chg", "npos", "nneg"])

    summ = rel.bucketed_groups(signs, ["event_type", "b"], _summary,
                               est_rows=_nrows(sf_dir, "events")).to_pandas()
    out_t, out_p, out_n, out_r = [], [], [], []
    for t, g in summ.groupby("event_type", sort=True):
        g = g.sort_values("b")
        runs = 1 + int(g["chg"].sum())
        runs += int((g["first"].to_numpy(np.int64)[1:]
                     != g["last"].to_numpy(np.int64)[:-1]).sum())
        out_t.append(t)
        out_p.append(int(g["npos"].sum()))
        out_n.append(int(g["nneg"].sum()))
        out_r.append(runs)
    return pa.table({
        "event_type": pa.array(out_t), "n_pos": pa.array(out_p, pa.int64()),
        "n_neg": pa.array(out_n, pa.int64()),
        "runs": pa.array(out_r, pa.int64()),
    })


SQL_EVENTS_RUNS_TEST = """
WITH c AS (
  SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v,
         ts, event_id
  FROM events
),
med AS (
  SELECT event_type, v AS med FROM (
    SELECT event_type, v,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM c
  ) WHERE rn = (n + 1) // 2
),
s AS (
  SELECT c.event_type, CAST(SIGN(c.v - med.med) AS BIGINT) AS sg,
         ts, event_id
  FROM c JOIN med USING (event_type) WHERE c.v <> med.med
),
w AS (
  SELECT event_type, sg,
         LAG(sg) OVER (PARTITION BY event_type
                       ORDER BY ts, event_id) AS pg
  FROM s
)
SELECT event_type,
       CAST(SUM(CASE WHEN sg = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       CAST(SUM(CASE WHEN sg = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
       CAST(SUM(CASE WHEN pg IS NULL OR sg <> pg THEN 1 ELSE 0 END)
            AS BIGINT) AS runs
FROM w GROUP BY event_type
"""


def q_image_upscale_stats(sf_dir: str):  # exact oracle (1-D LEAD collapse)
    """Exact 2× BILINEAR UPSAMPLE checkpoints through the decode path
    (``media.image_upscale_stats``): corner-aligned floor-integer
    bilinear (source / mean-of-2 / mean-of-4 lattice), per-channel sums +
    a row-weighted G sum — the UPSCALE face of the resize op next to
    `image_downscale_stats`' box pyramid. On the factorized fixture every
    output row (R) / column (G) is identical, so the oracle collapses to
    1-D grids with LEAD midpoints."""
    docs = _rp(sf_dir, "documents", ["doc_id"])

    synth = docs.map_batches(_image_fixture_synth, batch_format="pyarrow", batch_size=512)
    return mstage.image_upscale_stats(synth, batch_size=512)


SQL_IMAGE_UPSCALE_STATS = """
WITH """ + _SQL_IM3 + """,
rq AS (
  SELECT image_id, j, h,
         CASE WHEN fi = 2
              THEN ((br + (j * 55) // (w - 1)) // 4) * 4
                   + ((br + (j * 55) // (w - 1)) // 4) // 16
              ELSE br + (j * 55) // (w - 1) END AS v
  FROM im, (SELECT unnest(range(40)) AS j) js WHERE j < w
),
gq AS (
  SELECT image_id, r, w,
         CASE WHEN fi = 2
              THEN ((bg + (r * 41) // (h - 1)) // 4) * 4
                   + ((bg + (r * 41) // (h - 1)) // 4) // 16
              ELSE bg + (r * 41) // (h - 1) END AS v
  FROM im, (SELECT unnest(range(24)) AS r) rs2 WHERE r < h
),
r2 AS (
  SELECT image_id, v,
         LEAD(v) OVER (PARTITION BY image_id ORDER BY j) AS nv
  FROM rq
),
rs AS (  -- one upsampled R row: sources + LEAD midpoints
  SELECT image_id, SUM(v) + SUM((v + nv) // 2) AS rowsum
  FROM r2 GROUP BY image_id
),
g2 AS (
  SELECT image_id, r, v,
         LEAD(v) OVER (PARTITION BY image_id ORDER BY r) AS nv
  FROM gq
),
gs AS (  -- one upsampled G column + its row-position weights
  SELECT image_id,
         SUM(v) + SUM((v + nv) // 2) AS colsum,
         SUM(v * (2 * r + 1))
           + SUM(((v + nv) // 2) * (2 * r + 2)) AS wcolsum
  FROM g2 GROUP BY image_id
)
SELECT im.image_id,
       CAST(2 * h - 1 AS BIGINT) AS up_h,
       CAST(2 * w - 1 AS BIGINT) AS up_w,
       CAST((2 * h - 1) * rs.rowsum AS BIGINT) AS sum_r,
       CAST((2 * w - 1) * gs.colsum AS BIGINT) AS sum_g,
       CAST((2 * h - 1) * (2 * w - 1) *
            (CASE WHEN fi = 2 THEN (bb // 4) * 4 + (bb // 4) // 16
                  ELSE bb END) AS BIGINT) AS sum_b,
       CAST((2 * w - 1) * gs.wcolsum AS BIGINT) AS wsum_g
FROM im JOIN rs USING (image_id) JOIN gs USING (image_id)
"""


def q_image_median_filter(sf_dir: str):  # exact oracle (1-D median-of-3)
    """3×3 MEDIAN FILTER checkpoints through the decode path
    (``media.image_median_filter``): per-channel sums of the order-
    statistic-filtered interior — the impulse-noise denoiser next to the
    linear blurs (`grid_box_blur`, `image_laplacian_noise`). On the
    factorized fixture each channel varies along one axis, so the 9-window
    multiset is {prev×3, cur×3, next×3} and the 5th order statistic is the
    1-D median-of-3 (x+y+z − GREATEST − LEAST); the kernel is the general
    2-D filter (pytest drives it with unstructured random images)."""
    docs = _rp(sf_dir, "documents", ["doc_id"])

    synth = docs.map_batches(_image_fixture_synth, batch_format="pyarrow", batch_size=512)
    return mstage.image_median_filter(synth, batch_size=512)


SQL_IMAGE_MEDIAN_FILTER = """
WITH """ + _SQL_IM3 + """,
rq AS (
  SELECT image_id, j, w,
         CASE WHEN fi = 2
              THEN ((br + (j * 55) // (w - 1)) // 4) * 4
                   + ((br + (j * 55) // (w - 1)) // 4) // 16
              ELSE br + (j * 55) // (w - 1) END AS v
  FROM im, (SELECT unnest(range(40)) AS j) js WHERE j < w
),
r2 AS (
  SELECT image_id, j, w, v,
         LAG(v)  OVER (PARTITION BY image_id ORDER BY j) AS pv,
         LEAD(v) OVER (PARTITION BY image_id ORDER BY j) AS nv
  FROM rq
),
rs AS (  -- one filtered R row: 1-D median-of-3 over interior columns
  SELECT image_id,
         SUM(pv + v + nv - GREATEST(pv, v, nv) - LEAST(pv, v, nv)) AS rowsum
  FROM r2 WHERE j >= 1 AND j <= w - 2 GROUP BY image_id
),
gq AS (
  SELECT image_id, r, h,
         CASE WHEN fi = 2
              THEN ((bg + (r * 41) // (h - 1)) // 4) * 4
                   + ((bg + (r * 41) // (h - 1)) // 4) // 16
              ELSE bg + (r * 41) // (h - 1) END AS v
  FROM im, (SELECT unnest(range(24)) AS r) rs2 WHERE r < h
),
g2 AS (
  SELECT image_id, r, h, v,
         LAG(v)  OVER (PARTITION BY image_id ORDER BY r) AS pv,
         LEAD(v) OVER (PARTITION BY image_id ORDER BY r) AS nv
  FROM gq
),
gs AS (
  SELECT image_id,
         SUM(pv + v + nv - GREATEST(pv, v, nv) - LEAST(pv, v, nv)) AS colsum
  FROM g2 WHERE r >= 1 AND r <= h - 2 GROUP BY image_id
)
SELECT im.image_id,
       CAST(h - 2 AS BIGINT) AS int_h,
       CAST(w - 2 AS BIGINT) AS int_w,
       CAST((h - 2) * rs.rowsum AS BIGINT) AS med_r,
       CAST((w - 2) * gs.colsum AS BIGINT) AS med_g,
       CAST((h - 2) * (w - 2) *
            (CASE WHEN fi = 2 THEN (bb // 4) * 4 + (bb // 4) // 16
                  ELSE bb END) AS BIGINT) AS med_b
FROM im JOIN rs USING (image_id) JOIN gs USING (image_id)
"""


def q_segment_raster_cells(sf_dir: str):  # exact oracle (recursive replay)
    """BRESENHAM LINE RASTERIZATION of bounded trajectory segments onto
    the 256-unit cell grid (``spatial.bresenham_cells``): the vector→
    raster paint primitive every tile emission computes (the reference's
    mbtiles path rasterizes every conflation-map line into tile pixels).
    Per segment: plotted-cell count (Chebyshev span + 1, all octants,
    combined diagonal step) and a position-sensitive Σ(31x+17y) checksum.
    The engine walk is a numpy mask loop over ≤ 5 steps for the WHOLE
    batch; the oracle replays the identical integer error-term recurrence
    in a recursive CTE. Endpoints clamp into [0, 65535] so floor and
    trunc division agree on both sides."""
    from ..stages import segments
    from ..stages.spatial import bresenham_cells

    def _segs(uid: int, xy: np.ndarray):
        xyi = xy.astype(np.int64)
        out = []
        for i in range(len(xyi) - 1):
            dx = int(xyi[i + 1, 0]) % 2001 - 1000
            dy = int(xyi[i + 1, 1]) % 2001 - 1000
            bx = min(max(int(xyi[i, 0]) + dx, 0), 65535)
            by = min(max(int(xyi[i, 1]) + dy, 0), 65535)
            out.append({"user_id": np.int64(uid), "seg_i": np.int64(i + 1),
                        "ax": np.int64(xyi[i, 0]), "ay": np.int64(xyi[i, 1]),
                        "bx": np.int64(bx), "by": np.int64(by)})
        return out

    segs = segments.per_shape(_event_shapes(sf_dir), _segs)
    return bresenham_cells(segs, cell=256)


SQL_SEGMENT_RASTER_CELLS = """
WITH RECURSIVE pts AS (
  SELECT user_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gi,
         CAST((event_id * 48271 + user_id * 977) % 65536 AS BIGINT) AS x,
         CAST((event_id * 69621 + 13) % 65536 AS BIGINT) AS y
  FROM events
),
segs AS (
  SELECT user_id, gi AS seg_i,
         x // 256 AS cx0, y // 256 AS cy0,
         LEAST(GREATEST(x + (nx % 2001 - 1000), 0), 65535) // 256 AS cx1,
         LEAST(GREATEST(y + (ny % 2001 - 1000), 0), 65535) // 256 AS cy1
  FROM (SELECT user_id, gi, x, y,
               lead(x) OVER (PARTITION BY user_id ORDER BY gi) AS nx,
               lead(y) OVER (PARTITION BY user_id ORDER BY gi) AS ny
        FROM pts)
  WHERE nx IS NOT NULL
),
init AS (
  SELECT user_id, seg_i, cx1, cy1,
         ABS(cx1 - cx0) AS dx, -ABS(cy1 - cy0) AS dy,
         CASE WHEN cx0 < cx1 THEN 1 ELSE -1 END AS sx,
         CASE WHEN cy0 < cy1 THEN 1 ELSE -1 END AS sy,
         ABS(cx1 - cx0) - ABS(cy1 - cy0) AS err,
         cx0 AS x, cy0 AS y
  FROM segs
),
walk AS (
  SELECT user_id, seg_i, cx1, cy1, dx, dy, sx, sy, err, x, y,
         CAST(1 AS BIGINT) AS n_cells,
         31 * x + 17 * y AS cell_sum
  FROM init
  UNION ALL
  SELECT user_id, seg_i, cx1, cy1, dx, dy, sx, sy,
         err + (CASE WHEN 2 * err >= dy THEN dy ELSE 0 END)
             + (CASE WHEN 2 * err <= dx THEN dx ELSE 0 END),
         x + (CASE WHEN 2 * err >= dy THEN sx ELSE 0 END),
         y + (CASE WHEN 2 * err <= dx THEN sy ELSE 0 END),
         n_cells + 1,
         cell_sum + 31 * (x + CASE WHEN 2 * err >= dy THEN sx ELSE 0 END)
                  + 17 * (y + CASE WHEN 2 * err <= dx THEN sy ELSE 0 END)
  FROM walk WHERE x != cx1 OR y != cy1
)
SELECT user_id, CAST(seg_i AS BIGINT) AS seg_i,
       CAST(n_cells AS BIGINT) AS n_cells,
       CAST(cell_sum AS BIGINT) AS cell_sum
FROM walk WHERE x = cx1 AND y = cy1
"""


def q_image_glcm_texture(sf_dir: str):  # exact oracle (1-D pair collapse)
    """GLCM TEXTURE checkpoints through the decode path
    (``media.image_glcm_texture``): Haralick contrast / energy / occupied-
    cell trio of the 8-level co-occurrence matrix, R at horizontal offset
    and G at vertical — the texture screen of image curation (synthetics
    hug the GLCM diagonal, photographs spread off it). On the factorized
    fixture each co-occurrence pair repeats exactly h (resp. w) times, so
    the oracle is a 1-D LEAD pair count; the kernel is the general 2-D
    bincount (pytest drives random images)."""
    docs = _rp(sf_dir, "documents", ["doc_id"])

    synth = docs.map_batches(_image_fixture_synth, batch_format="pyarrow", batch_size=512)
    return mstage.image_glcm_texture(synth, batch_size=512)


SQL_IMAGE_GLCM_TEXTURE = """
WITH im AS (
  SELECT doc_id AS image_id,
         16 + (doc_id % 4) * 8 AS w, 12 + (doc_id % 3) * 6 AS h,
         doc_id % 3 AS fi,
         (doc_id * 7) % 200 AS br, (doc_id * 11) % 200 AS bg
  FROM documents
),
rq AS (
  SELECT image_id, j,
         (CASE WHEN fi = 2
               THEN ((br + (j * 55) // (w - 1)) // 4) * 4
                    + ((br + (j * 55) // (w - 1)) // 4) // 16
               ELSE br + (j * 55) // (w - 1) END) // 32 AS q
  FROM im, (SELECT unnest(range(40)) AS j) js WHERE j < w
),
rp AS (
  SELECT image_id, q AS qa,
         LEAD(q) OVER (PARTITION BY image_id ORDER BY j) AS qb
  FROM rq
),
rpc AS (
  SELECT image_id, qa, qb, COUNT(*) AS c
  FROM rp WHERE qb IS NOT NULL GROUP BY image_id, qa, qb
),
rs AS (
  SELECT rpc.image_id,
         SUM(h * c * (qa - qb) * (qa - qb)) AS con,
         SUM(h * h * c * c) AS ene, COUNT(*) AS cel
  FROM rpc JOIN im ON im.image_id = rpc.image_id
  GROUP BY rpc.image_id
),
gq AS (
  SELECT image_id, r,
         (CASE WHEN fi = 2
               THEN ((bg + (r * 41) // (h - 1)) // 4) * 4
                    + ((bg + (r * 41) // (h - 1)) // 4) // 16
               ELSE bg + (r * 41) // (h - 1) END) // 32 AS q
  FROM im, (SELECT unnest(range(24)) AS r) rs2 WHERE r < h
),
gp AS (
  SELECT image_id, q AS qa,
         LEAD(q) OVER (PARTITION BY image_id ORDER BY r) AS qb
  FROM gq
),
gpc AS (
  SELECT image_id, qa, qb, COUNT(*) AS c
  FROM gp WHERE qb IS NOT NULL GROUP BY image_id, qa, qb
),
gs AS (
  SELECT gpc.image_id,
         SUM(w * c * (qa - qb) * (qa - qb)) AS con,
         SUM(w * w * c * c) AS ene, COUNT(*) AS cel
  FROM gpc JOIN im ON im.image_id = gpc.image_id
  GROUP BY gpc.image_id
)
SELECT im.image_id,
       CAST(rs.con AS BIGINT) AS con_r, CAST(rs.ene AS BIGINT) AS ene_r,
       CAST(rs.cel AS BIGINT) AS cel_r,
       CAST(gs.con AS BIGINT) AS con_g, CAST(gs.ene AS BIGINT) AS ene_g,
       CAST(gs.cel AS BIGINT) AS cel_g
FROM im JOIN rs ON rs.image_id = im.image_id
        JOIN gs ON gs.image_id = im.image_id
"""


def q_grid_viewshed(sf_dir: str):  # exact oracle (recursive ray replay)
    """R3 VIEWSHED over the probe-point density raster
    (``spatial.grid_viewshed``): which cells a mast at (32, 32) with a
    +2 antenna can see, density as elevation — the DEM coverage-planning
    classic next to D8 flow routing. Division-free visibility: target T
    at Bresenham step count K is blocked iff any intermediate cell P at
    step k has (e(P)−eO)·K ≥ (e(T)−eO)·k (step index as distance, ties
    block). Engine: one raster combiner, then ONE vectorized mask walk
    advances all 4095 rays simultaneously; oracle: the identical
    Bresenham error-term recurrence per target in a recursive CTE with a
    carried blocked flag."""
    pts = conflation.read_points(sf_dir)
    return spatial.grid_viewshed(pts, "px", "py", cell=1024, grid_n=64,
                                 ox=32, oy=32, antenna=2,
                                 est_rows=_nrows(sf_dir, "lineitem"))


SQL_GRID_VIEWSHED = _CTES.replace("WITH points", "WITH RECURSIVE points", 1) + """,
cells AS (
  SELECT px // 1024 AS cx, py // 1024 AS cy, CAST(COUNT(*) AS BIGINT) AS v
  FROM points GROUP BY 1, 2
),
grid AS (
  SELECT gx.cx, gy.cy, COALESCE(c.v, 0) AS v
  FROM (SELECT unnest(range(64)) AS cx) gx
  CROSS JOIN (SELECT unnest(range(64)) AS cy) gy
  LEFT JOIN cells c ON c.cx = gx.cx AND c.cy = gy.cy
),
obs AS (SELECT v + 2 AS eo FROM grid WHERE cx = 32 AND cy = 32),
tgt AS (
  SELECT cx, cy, v,
         GREATEST(ABS(cx - 32), ABS(cy - 32)) AS kk,
         ABS(cx - 32) AS dx, -ABS(cy - 32) AS dy,
         CASE WHEN cx > 32 THEN 1 ELSE -1 END AS sx,
         CASE WHEN cy > 32 THEN 1 ELSE -1 END AS sy,
         ABS(cx - 32) - ABS(cy - 32) AS err
  FROM grid WHERE NOT (cx = 32 AND cy = 32)
),
walk AS (
  SELECT cx, cy, v, kk, dx, dy, sx, sy, err,
         32 AS x, 32 AS y, 0 AS k, FALSE AS blocked
  FROM tgt
  UNION ALL
  SELECT w.cx, w.cy, w.v, w.kk, w.dx, w.dy, w.sx, w.sy,
         w.err + CASE WHEN 2 * w.err >= w.dy THEN w.dy ELSE 0 END
               + CASE WHEN 2 * w.err <= w.dx THEN w.dx ELSE 0 END,
         g.cx, g.cy, w.k + 1,
         w.blocked OR (g.v - o.eo) * w.kk >= (w.v - o.eo) * (w.k + 1)
  FROM walk w CROSS JOIN obs o
  JOIN grid g
    ON g.cx = w.x + CASE WHEN 2 * w.err >= w.dy THEN w.sx ELSE 0 END
   AND g.cy = w.y + CASE WHEN 2 * w.err <= w.dx THEN w.sy ELSE 0 END
  WHERE w.k + 1 <= w.kk - 1
)
SELECT cx, cy, CAST(v AS BIGINT) AS v, CAST(kk AS BIGINT) AS k_steps
FROM walk
WHERE k = GREATEST(kk - 1, 0) AND NOT blocked
"""


def q_user_max_nonoverlap(sf_dir: str):  # exact oracle (list-CTE greedy)
    """ACTIVITY SELECTION (maximum non-overlapping intervals) per user:
    each event opens a variable window of (event_id % 7 + 1) minutes; the
    earliest-end greedy — provably optimal for this problem — picks the
    max set of pairwise non-overlapping windows ([s, e) half-open, next
    pick needs s ≥ last e; ties by (e, s, event_id)). The scheduling
    core of every booking / crew-rostering / ad-slot pipeline, and the
    selection companion of ``user_interval_coverage``'s union sweep.
    Engine: one bucketed group shuffle, vectorized per-user sort + an
    O(n) greedy scan; oracle: per-user end-sorted interval LISTS carried
    through a recursive CTE (the vector-in-CTE device), each round
    list-filtering for the first start ≥ current end. Emits
    (user_id, n_sel, e_sum)."""
    from ..stages.relational import bucketed_groups

    ev = _rp(sf_dir, "events", ["user_id", "ts", "event_id"])

    def _iv(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        e = s + (eid % 7 + 1) * 60_000_000
        return pa.table({"user_id": batch["user_id"].cast(pa.int64()),
                         "s": s, "e": e, "event_id": eid})

    iv = ev.map_batches(_iv, batch_format="pyarrow", batch_size=8192)

    def _greedy(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["user_id", "e", "s", "event_id"],
                          kind="mergesort")
        uid = d["user_id"].to_numpy()
        s = d["s"].to_numpy().astype(np.int64)
        e = d["e"].to_numpy().astype(np.int64)
        n = len(d)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(new_user)
        users, nsel, esum = [], [], []
        for a, b in zip(starts, np.append(starts[1:], n)):
            cnt, tot = windows.greedy_nonoverlap(s[a:b], e[a:b])
            users.append(int(uid[a]))
            nsel.append(cnt)
            esum.append(tot)
        return pd.DataFrame({"user_id": np.asarray(users, np.int64),
                             "n_sel": np.asarray(nsel, np.int64),
                             "e_sum": np.asarray(esum, np.int64)})

    return bucketed_groups(iv, ["user_id"], _greedy)


SQL_USER_MAX_NONOVERLAP = """
WITH RECURSIVE iv AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS s,
         CAST(epoch_us(ts) AS BIGINT) + (event_id % 7 + 1) * 60000000 AS e,
         event_id
  FROM events
),
lst AS (
  SELECT user_id,
         list(s ORDER BY e, s, event_id) AS ss,
         list(e ORDER BY e, s, event_id) AS ee
  FROM iv GROUP BY user_id
),
greedy AS (
  SELECT user_id, ss, ee, ee[1] AS cur_end,
         CAST(1 AS BIGINT) AS cnt, ee[1] AS esum
  FROM lst
  UNION ALL
  SELECT user_id, ss, ee,
         ee[list_filter(range(1, len(ss) + 1), i -> ss[i] >= cur_end)[1]],
         cnt + 1,
         esum + ee[list_filter(range(1, len(ss) + 1),
                               i -> ss[i] >= cur_end)[1]]
  FROM greedy
  WHERE len(list_filter(range(1, len(ss) + 1), i -> ss[i] >= cur_end)) > 0
)
SELECT user_id, CAST(MAX(cnt) AS BIGINT) AS n_sel,
       CAST(MAX(esum) AS BIGINT) AS e_sum
FROM greedy GROUP BY user_id
"""


def q_image_hough_lines(sf_dir: str):  # exact oracle (1-D×1-D edge product)
    """HOUGH LINE TRANSFORM peak through the decode path
    (``media.image_hough_lines``): interior pixels whose central-
    difference luma gradient clears |dx|+|dy| ≥ 5 vote into an 8-angle ×
    quantized-ρ accumulator (fixed-point (cos,sin)·1024 — the integer
    grid IS the definition, the `shape_rotfrechet` device); emits the
    edge count and the argmax bucket (ties to smallest (k, ρ)) — the
    line-structure detector separating diagrams from photographs. On the
    factorized fixture luma = f(j) + g(r) + const, so the edge set is a
    product of 1-D gradient grids and the oracle is a cross join × the
    angle VALUES table; ρ is offset positive so floor and trunc division
    agree."""
    docs = _rp(sf_dir, "documents", ["doc_id"])

    synth = docs.map_batches(_image_fixture_synth, batch_format="pyarrow", batch_size=512)
    return mstage.image_hough_lines(synth, batch_size=512)


SQL_IMAGE_HOUGH_LINES = """
WITH im AS (
  SELECT doc_id AS image_id,
         16 + (doc_id % 4) * 8 AS w, 12 + (doc_id % 3) * 6 AS h,
         doc_id % 3 AS fi,
         (doc_id * 7) % 200 AS br, (doc_id * 11) % 200 AS bg
  FROM documents
),
ang(k, c, s) AS (VALUES
  (0, 1024, 0), (1, 946, 392), (2, 724, 724), (3, 392, 946),
  (4, 0, 1024), (5, -392, 946), (6, -724, 724), (7, -946, 392)
),
fq AS (
  SELECT image_id, j,
         CASE WHEN fi = 2
              THEN ((br + (j * 55) // (w - 1)) // 4) * 4
                   + ((br + (j * 55) // (w - 1)) // 4) // 16
              ELSE br + (j * 55) // (w - 1) END AS f
  FROM im, (SELECT unnest(range(40)) AS j) js WHERE j < w
),
dxq AS (
  SELECT a.image_id, a.j, n.f - p.f AS df
  FROM fq a
  JOIN fq n ON n.image_id = a.image_id AND n.j = a.j + 1
  JOIN fq p ON p.image_id = a.image_id AND p.j = a.j - 1
),
gq AS (
  SELECT image_id, r,
         CASE WHEN fi = 2
              THEN ((bg + (r * 41) // (h - 1)) // 4) * 4
                   + ((bg + (r * 41) // (h - 1)) // 4) // 16
              ELSE bg + (r * 41) // (h - 1) END AS g
  FROM im, (SELECT unnest(range(24)) AS r) rs2 WHERE r < h
),
dyq AS (
  SELECT a.image_id, a.r, n.g - p.g AS dg
  FROM gq a
  JOIN gq n ON n.image_id = a.image_id AND n.r = a.r + 1
  JOIN gq p ON p.image_id = a.image_id AND p.r = a.r - 1
),
edges AS (
  SELECT d.image_id, d.j, e.r
  FROM dxq d JOIN dyq e ON e.image_id = d.image_id
  WHERE ABS(d.df) + ABS(e.dg) >= 5
),
ne AS (SELECT image_id, COUNT(*) AS n_edge FROM edges GROUP BY image_id),
votes AS (
  SELECT image_id, k, (j * c + r * s + 65536) // 2048 AS rho,
         COUNT(*) AS v
  FROM edges CROSS JOIN ang GROUP BY image_id, k, rho
),
best AS (
  SELECT image_id, v, k, rho,
         ROW_NUMBER() OVER (PARTITION BY image_id
                            ORDER BY v DESC, k, rho) AS rn
  FROM votes
)
SELECT im.image_id,
       CAST(COALESCE(ne.n_edge, 0) AS BIGINT) AS n_edge,
       CAST(COALESCE(b.v, 0) AS BIGINT) AS best_votes,
       CAST(COALESCE(b.k, -1) AS BIGINT) AS best_k,
       CAST(COALESCE(b.rho, -1) AS BIGINT) AS best_rho
FROM im
LEFT JOIN ne ON ne.image_id = im.image_id
LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.image_id = im.image_id
"""


def q_image_affine_sample(sf_dir: str):  # exact oracle (grid enumeration)
    """NEAREST-NEIGHBOR AFFINE WARP checkpoints through the decode path
    (``media.image_affine_sample``): per image a fixed-point rotation
    (8-angle (cos,sin)·1024 table keyed by id % 8) + small translation
    resamples onto a 16×16 grid; per-channel sums plus a raster-position-
    weighted R sum — the rotate/rectify/augmentation resampling core.
    The oracle enumerates the 256-cell output grid per image, replays
    the identical offset-positive floor divide + border clamp, and
    evaluates the fixture's closed-form pixel value at the warped source
    coordinate (no separability needed — the warp mixes axes)."""
    docs = _rp(sf_dir, "documents", ["doc_id"])

    synth = docs.map_batches(_image_fixture_synth, batch_format="pyarrow", batch_size=512)
    return mstage.image_affine_sample(synth, batch_size=512)


SQL_IMAGE_AFFINE_SAMPLE = """
WITH im AS (
  SELECT doc_id AS image_id,
         16 + (doc_id % 4) * 8 AS w, 12 + (doc_id % 3) * 6 AS h,
         doc_id % 3 AS fi,
         (doc_id * 7) % 200 AS br, (doc_id * 11) % 200 AS bg,
         (doc_id * 3) % 200 AS bb,
         doc_id % 5 - 2 AS tx, doc_id % 3 - 1 AS ty
  FROM documents
),
ang(k, c, s) AS (VALUES
  (0, 1024, 0), (1, 946, 392), (2, 724, 724), (3, 392, 946),
  (4, 0, 1024), (5, -392, 946), (6, -724, 724), (7, -946, 392)
),
cells AS (
  SELECT im.*, ang.c, ang.s, gi.i, gj.j
  FROM im
  JOIN ang ON ang.k = im.image_id % 8
  CROSS JOIN (SELECT unnest(range(16)) AS i) gi
  CROSS JOIN (SELECT unnest(range(16)) AS j) gj
),
src AS (
  SELECT image_id, w, h, fi, br, bg, bb, i, j,
         LEAST(GREATEST((j * c - i * s + 16777216) // 1024 - 16384 + tx,
                        0), w - 1) AS sx,
         LEAST(GREATEST((j * s + i * c + 16777216) // 1024 - 16384 + ty,
                        0), h - 1) AS sy
  FROM cells
),
px AS (
  SELECT image_id, i, j,
         CASE WHEN fi = 2
              THEN ((br + (sx * 55) // (w - 1)) // 4) * 4
                   + ((br + (sx * 55) // (w - 1)) // 4) // 16
              ELSE br + (sx * 55) // (w - 1) END AS vr,
         CASE WHEN fi = 2
              THEN ((bg + (sy * 41) // (h - 1)) // 4) * 4
                   + ((bg + (sy * 41) // (h - 1)) // 4) // 16
              ELSE bg + (sy * 41) // (h - 1) END AS vg,
         CASE WHEN fi = 2 THEN (bb // 4) * 4 + (bb // 4) // 16
              ELSE bb END AS vb
  FROM src
)
SELECT image_id,
       CAST(SUM(vr) AS BIGINT) AS sum_r,
       CAST(SUM(vg) AS BIGINT) AS sum_g,
       CAST(SUM(vb) AS BIGINT) AS sum_b,
       CAST(SUM(vr * (16 * i + j + 1)) AS BIGINT) AS wsum_r
FROM px GROUP BY image_id
"""


def q_lineitem_ols2(sf_dir: str):  # exact oracle (centered Cramer pieces)
    """TWO-FEATURE MULTIPLE REGRESSION per (supplier, ship-year) as exact
    integer Cramer pieces: fit y = a + b1·x1 + b2·x2 (y = price in $1000
    units, x1 = quantity, x2 = discount %) via the centered normal
    equations — emits the shared denominator S11·S22 − S12² and the two
    slope numerators (b = num/den as exact rationals), completing the
    regression suite (1-var OLS `supplier_qty_trend`, robust Theil-Sen,
    Mann-Kendall significance → multiple regression). One combiner-first
    group shuffle of 9 product sums; the dets are a vectorized epilogue
    on the group-sized table. Int64-safe for group sizes ≤ ~10⁴ (domain
    documented; fixture groups are ~10²)."""
    li = _rp(sf_dir, "lineitem", ["l_suppkey", "l_shipdate", "l_quantity",
                                  "l_discount", "l_extendedprice"])

    def _prep(batch: pa.Table) -> pa.Table:
        x1 = cents(batch["l_quantity"].to_numpy(zero_copy_only=False), 1)
        x2 = cents(batch["l_discount"].to_numpy(zero_copy_only=False), 100)
        y = cents(batch["l_extendedprice"].to_numpy(zero_copy_only=False)) \
            // 100000
        yr = pc.year(batch["l_shipdate"]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"l_suppkey": sk, "yr": yr,
                         "s1": x1, "s2": x2, "sy": y,
                         "s11": x1 * x1, "s12": x1 * x2, "s22": x2 * x2,
                         "s1y": x1 * y, "s2y": x2 * y})

    prep = li.map_batches(_prep, batch_format="pyarrow", batch_size=8192)
    sums = rel.partial_groupby_sum(
        prep, ["l_suppkey", "yr"],
        ["s1", "s2", "sy", "s11", "s12", "s22", "s1y", "s2y"],
        count_as="n", est_rows=_nrows(sf_dir, "lineitem"))

    def _dets(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(np.int64)
        s1 = df["s1"].to_numpy(np.int64)
        s2 = df["s2"].to_numpy(np.int64)
        sy = df["sy"].to_numpy(np.int64)
        c11 = n * df["s11"].to_numpy(np.int64) - s1 * s1
        c12 = n * df["s12"].to_numpy(np.int64) - s1 * s2
        c22 = n * df["s22"].to_numpy(np.int64) - s2 * s2
        c1y = n * df["s1y"].to_numpy(np.int64) - s1 * sy
        c2y = n * df["s2y"].to_numpy(np.int64) - s2 * sy
        return pd.DataFrame({
            "l_suppkey": df["l_suppkey"].to_numpy(np.int64),
            "yr": df["yr"].to_numpy(np.int64),
            "n": n, "den": c11 * c22 - c12 * c12,
            "b1_num": c22 * c1y - c12 * c2y,
            "b2_num": c11 * c2y - c12 * c1y})

    return sums.map_batches(_dets, batch_format="pandas", batch_size=8192)


SQL_LINEITEM_OLS2 = """
WITH b AS (
  SELECT l_suppkey, CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS yr,
         CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS x1,
         CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS x2,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) // 100000 AS y
  FROM lineitem
),
g AS (
  SELECT l_suppkey, yr, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x1 * x1) AS BIGINT) AS s11,
         CAST(SUM(x1 * x2) AS BIGINT) AS s12,
         CAST(SUM(x2 * x2) AS BIGINT) AS s22,
         CAST(SUM(x1 * y) AS BIGINT) AS s1y,
         CAST(SUM(x2 * y) AS BIGINT) AS s2y
  FROM b GROUP BY 1, 2
)
SELECT l_suppkey, yr, n,
       CAST((n * s11 - s1 * s1) * (n * s22 - s2 * s2)
            - (n * s12 - s1 * s2) * (n * s12 - s1 * s2) AS BIGINT) AS den,
       CAST((n * s22 - s2 * s2) * (n * s1y - s1 * sy)
            - (n * s12 - s1 * s2) * (n * s2y - s2 * sy) AS BIGINT) AS b1_num,
       CAST((n * s11 - s1 * s1) * (n * s2y - s2 * sy)
            - (n * s12 - s1 * s2) * (n * s1y - s1 * sy) AS BIGINT) AS b2_num
FROM g
"""


def q_tile_corridor(sf_dir: str):  # exact oracle (two unrolled SSSP fields)
    """LEAST-COST CORRIDOR analysis over the probe-tile kNN graph — the
    GIS routing primitive one level up from a single path: run the
    bounded Bellman-Ford cost field (``graphrank.sssp_rounds``, 3 rounds,
    exact for ≤3-edge paths) from BOTH endpoints (the lowest-id probe and
    the probe nearest to it), then keep every node whose through-cost
    dA + dB is within 25 % (integer ``best // 4``) of the best
    through-cost — the band of near-optimal detours a resilient route
    plan needs, not just the single shortest chain. The graph links each
    probe (every 10th tile) to its 4 nearest OTHER probes (dist², tie
    smallest id) so the corridor rides a connected backbone; the probe
    table is dimension-sized, so the kNN build is a vectorized driver
    epilogue while the SSSP fields run distributed over the edge
    Dataset. Emits (tile_id, da, db)."""
    from ..stages.graphrank import sssp_rounds

    t = td.tiles_table(sf_dir)
    tid = t["tile_id"].to_numpy().astype(np.int64)
    cx = t["cx"].to_numpy().astype(np.int64)
    cy = t["cy"].to_numpy().astype(np.int64)
    pm = tid % 10 == 0
    tid, cx, cy = tid[pm], cx[pm], cy[pm]
    n = len(tid)
    k = min(4, n - 1)
    srcs, dsts, ws = [], [], []
    for i in range(n):  # dimension-sized: n = |tiles| / 10
        d2 = (cx - cx[i]) ** 2 + (cy - cy[i]) ** 2
        order = np.lexsort((tid, d2))
        order = order[order != i][:k]
        srcs.append(np.full(k, tid[i]))
        dsts.append(tid[order])
        ws.append(d2[order])
    s = np.concatenate(srcs)
    d = np.concatenate(dsts)
    w = np.concatenate(ws)
    edges = ray.data.from_pandas(pd.DataFrame({
        "src": np.concatenate([s, d]), "dst": np.concatenate([d, s]),
        "w": np.concatenate([w, w])})).materialize()
    ai = int(np.argmin(tid))
    d2a = (cx - cx[ai]) ** 2 + (cy - cy[ai]) ** 2
    order = np.lexsort((tid, d2a))
    order = order[order != ai]
    bi = int(order[0])
    seed_a = ray.data.from_pandas(pd.DataFrame({"node": [int(tid[ai])]}))
    seed_b = ray.data.from_pandas(pd.DataFrame({"node": [int(tid[bi])]}))
    da = sssp_rounds(edges, seed_a, rounds=3).to_pandas()
    db = sssp_rounds(edges, seed_b, rounds=3).to_pandas()
    # both fields are tile-table-bounded; the merge + scalar filter run
    # driver-side on dimension-sized data
    both = da.merge(db, on="node", suffixes=("_a", "_b"))
    dav = both["cost_a"].to_numpy(np.int64)
    dbv = both["cost_b"].to_numpy(np.int64)
    best = int((dav + dbv).min()) if len(both) else 0
    keep = dav + dbv <= best + best // 4
    return pd.DataFrame({"tile_id": both["node"].to_numpy(np.int64)[keep],
                         "da": dav[keep], "db": dbv[keep]})


def _sssp_unroll_sql(prefix: str, seed_sql: str, rounds: int = 3) -> str:
    parts = [f",\n{prefix}0 AS ({seed_sql})"]
    for r in range(rounds):
        parts.append(f""",
{prefix}{r + 1} AS MATERIALIZED (
  SELECT node, MIN(cost) AS cost FROM (
    SELECT node, cost FROM {prefix}{r}
    UNION ALL
    SELECT e.t AS node, {prefix}{r}.cost + e.w AS cost
    FROM {prefix}{r} JOIN ed e ON e.s = {prefix}{r}.node
  ) GROUP BY node
)""")
    return "".join(parts)


SQL_TILE_CORRIDOR = f"""WITH tiles AS ({td.TILES_SQL}),
pn AS (SELECT tile_id, cx, cy FROM tiles WHERE tile_id % 10 = 0),
pk AS (
  SELECT s, t, w FROM (
    SELECT a.tile_id AS s, b.tile_id AS t,
           (a.cx - b.cx) * (a.cx - b.cx)
           + (a.cy - b.cy) * (a.cy - b.cy) AS w,
           ROW_NUMBER() OVER (
             PARTITION BY a.tile_id
             ORDER BY (a.cx - b.cx) * (a.cx - b.cx)
                    + (a.cy - b.cy) * (a.cy - b.cy), b.tile_id) AS rn
    FROM pn a JOIN pn b ON b.tile_id <> a.tile_id
  ) WHERE rn <= 4
),
ed AS MATERIALIZED (
  SELECT s, t, w FROM pk
  UNION ALL
  SELECT t, s, w FROM pk
),
pa_seed AS (
  SELECT tile_id AS node, cx, cy FROM pn ORDER BY tile_id LIMIT 1
),
pb_seed AS (
  SELECT b.tile_id AS node FROM pn b, pa_seed a
  WHERE b.tile_id <> a.node
  ORDER BY (b.cx - a.cx) * (b.cx - a.cx)
         + (b.cy - a.cy) * (b.cy - a.cy), b.tile_id
  LIMIT 1
)""" + _sssp_unroll_sql(
    "a", "SELECT node, CAST(0 AS BIGINT) AS cost FROM pa_seed"
) + _sssp_unroll_sql(
    "b", "SELECT node, CAST(0 AS BIGINT) AS cost FROM pb_seed"
) + """,
ab AS (
  SELECT a3.node, a3.cost AS da, b3.cost AS db
  FROM a3 JOIN b3 ON b3.node = a3.node
),
best AS (SELECT MIN(da + db) AS m FROM ab)
SELECT node AS tile_id, CAST(da AS BIGINT) AS da, CAST(db AS BIGINT) AS db
FROM ab, best WHERE da + db <= m + m // 4
"""


def q_traj_gyration(sf_dir: str):  # exact oracle (moment sums)
    """RADIUS OF GYRATION per user trajectory — the mobility-analysis
    classic (the González/Hidalgo/Barabási characteristic travel scale)
    as exact integer moment pieces: rg² = A / n² with
    A = n·Σ(x²+y²) − (Σx)² − (Σy)² (the cross-multiplied centered second
    moment about the centroid, division-free). One combiner-first group
    shuffle of four sums; int64-safe for ≤ ~10⁴ points per user
    (documented; fixture users are ~10²). Emits (user_id, n, a2)."""
    ev = _rp(sf_dir, "events", ["event_id", "user_id"])

    def _pts(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = (eid * 48271 + uid * 977) % 65536
        y = (eid * 69621 + 13) % 65536
        return pa.table({"user_id": uid, "sx": x, "sy": y,
                         "s2": x * x + y * y})

    pts = ev.map_batches(_pts, batch_format="pyarrow", batch_size=8192)
    sums = rel.partial_groupby_sum(pts, ["user_id"], ["sx", "sy", "s2"],
                                   count_as="n",
                                   est_rows=_nrows(sf_dir, "events"))

    def _gyr(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(np.int64)
        sx = df["sx"].to_numpy(np.int64)
        sy = df["sy"].to_numpy(np.int64)
        s2 = df["s2"].to_numpy(np.int64)
        return pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64),
                             "n": n, "a2": n * s2 - sx * sx - sy * sy})

    return sums.map_batches(_gyr, batch_format="pandas", batch_size=8192)


SQL_TRAJ_GYRATION = """
WITH pts AS (
  SELECT user_id,
         CAST((event_id * 48271 + user_id * 977) % 65536 AS BIGINT) AS x,
         CAST((event_id * 69621 + 13) % 65536 AS BIGINT) AS y
  FROM events
),
g AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x + y * y) AS BIGINT) AS s2
  FROM pts GROUP BY user_id
)
SELECT user_id, n, CAST(n * s2 - sx * sx - sy * sy AS BIGINT) AS a2
FROM g
"""


def q_image_fast_corners(sf_dir: str):  # exact oracle (1-D×1-D ring test)
    """FAST-lite CORNER DETECTION through the decode path
    (``media.image_fast_corners``): an interior pixel is a corner iff
    ≥ 6 of its 8 ring neighbors are brighter than center+8 or ≥ 6 darker
    than center−8 (the FAST segment test at radius 1) — the interest-
    point counterpart of the Hough line peak. On the factorized fixture
    each ring delta is a column-delta + row-delta, so the oracle is a
    1-D×1-D cross join with eight CASE terms; a position checksum
    Σ(31j+17i) pins the corner LOCATIONS, not just the count."""
    docs = _rp(sf_dir, "documents", ["doc_id"])

    synth = docs.map_batches(_image_fixture_synth, batch_format="pyarrow", batch_size=512)
    return mstage.image_fast_corners(synth, batch_size=512)


SQL_IMAGE_FAST_CORNERS = """
WITH im AS (
  SELECT doc_id AS image_id,
         16 + (doc_id % 4) * 8 AS w, 12 + (doc_id % 3) * 6 AS h,
         doc_id % 3 AS fi,
         (doc_id * 7) % 200 AS br, (doc_id * 11) % 200 AS bg
  FROM documents
),
fq AS (
  SELECT image_id, j,
         CASE WHEN fi = 2
              THEN ((br + (j * 55) // (w - 1)) // 4) * 4
                   + ((br + (j * 55) // (w - 1)) // 4) // 16
              ELSE br + (j * 55) // (w - 1) END AS f
  FROM im, (SELECT unnest(range(40)) AS j) js WHERE j < w
),
cdx AS (
  SELECT image_id, j,
         LAG(f)  OVER (PARTITION BY image_id ORDER BY j) - f AS cm,
         LEAD(f) OVER (PARTITION BY image_id ORDER BY j) - f AS cp
  FROM fq
),
gq AS (
  SELECT image_id, r,
         CASE WHEN fi = 2
              THEN ((bg + (r * 41) // (h - 1)) // 4) * 4
                   + ((bg + (r * 41) // (h - 1)) // 4) // 16
              ELSE bg + (r * 41) // (h - 1) END AS g
  FROM im, (SELECT unnest(range(24)) AS r) rs2 WHERE r < h
),
rdy AS (
  SELECT image_id, r,
         LAG(g)  OVER (PARTITION BY image_id ORDER BY r) - g AS rm,
         LEAD(g) OVER (PARTITION BY image_id ORDER BY r) - g AS rp
  FROM gq
),
px AS (
  SELECT c.image_id, c.j, d.r,
         (CASE WHEN c.cm + d.rm > 8 THEN 1 ELSE 0 END
          + CASE WHEN d.rm > 8 THEN 1 ELSE 0 END
          + CASE WHEN c.cp + d.rm > 8 THEN 1 ELSE 0 END
          + CASE WHEN c.cm > 8 THEN 1 ELSE 0 END
          + CASE WHEN c.cp > 8 THEN 1 ELSE 0 END
          + CASE WHEN c.cm + d.rp > 8 THEN 1 ELSE 0 END
          + CASE WHEN d.rp > 8 THEN 1 ELSE 0 END
          + CASE WHEN c.cp + d.rp > 8 THEN 1 ELSE 0 END) AS bc,
         (CASE WHEN c.cm + d.rm < -8 THEN 1 ELSE 0 END
          + CASE WHEN d.rm < -8 THEN 1 ELSE 0 END
          + CASE WHEN c.cp + d.rm < -8 THEN 1 ELSE 0 END
          + CASE WHEN c.cm < -8 THEN 1 ELSE 0 END
          + CASE WHEN c.cp < -8 THEN 1 ELSE 0 END
          + CASE WHEN c.cm + d.rp < -8 THEN 1 ELSE 0 END
          + CASE WHEN d.rp < -8 THEN 1 ELSE 0 END
          + CASE WHEN c.cp + d.rp < -8 THEN 1 ELSE 0 END) AS dc
  FROM cdx c JOIN rdy d ON d.image_id = c.image_id
  WHERE c.cm IS NOT NULL AND c.cp IS NOT NULL
    AND d.rm IS NOT NULL AND d.rp IS NOT NULL
)
SELECT im.image_id,
       CAST(COALESCE(SUM(CASE WHEN bc >= 6 OR dc >= 6 THEN 1 ELSE 0 END),
                     0) AS BIGINT) AS n_corners,
       CAST(COALESCE(SUM(CASE WHEN bc >= 6 OR dc >= 6
                          THEN 31 * j + 17 * r ELSE 0 END),
                     0) AS BIGINT) AS corner_sum
FROM im LEFT JOIN px ON px.image_id = im.image_id
GROUP BY im.image_id
"""


def q_events_range_sum(sf_dir: str):  # exact oracle (RANGE-frame window)
    """Per-user TIME-RANGE windowed aggregate: for every event, the sum
    and count of cents-quantized values in the trailing 5-minute RANGE
    frame (RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW on epoch
    µs) — the time-based sibling of `events_rolling_sum`'s ROWS frame,
    and the frame kind RANGE semantics make subtly different: all PEER
    rows (equal ts) share one frame regardless of physical order. Engine:
    one bucketed group shuffle, then per user a vectorized two-pointer
    (searchsorted left bound on ts−W, right bound on ts for peers) over
    a prefix-sum — no per-row Python. Emits
    (event_id, user_id, w_sum, w_cnt)."""
    from ..stages.relational import bucketed_groups
    from ..functions.numeric import cents as _cents

    ev = _rp(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    W = 300_000_000

    def _pre(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "event_id": df["event_id"].to_numpy(np.int64),
            "e": df["ts"].astype("int64").to_numpy(),
            "vc": _cents(df["value"].to_numpy()),
        })

    prep = ev.map_batches(_pre, batch_format="pandas", batch_size=8192)

    def _frame(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["user_id", "e", "event_id"], kind="mergesort")
        uid = d["user_id"].to_numpy()
        e = d["e"].to_numpy()
        vc = d["vc"].to_numpy()
        eid = d["event_id"].to_numpy()
        n = len(d)
        out_sum = np.empty(n, np.int64)
        out_cnt = np.empty(n, np.int64)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(new_user)
        for a, b in zip(starts, np.append(starts[1:], n)):
            ee = e[a:b]
            cs = np.concatenate([[0], np.cumsum(vc[a:b])])
            lo = np.searchsorted(ee, ee - W, side="left")
            hi = np.searchsorted(ee, ee, side="right")
            out_sum[a:b] = cs[hi] - cs[lo]
            out_cnt[a:b] = hi - lo
        return pd.DataFrame({"event_id": eid, "user_id": uid,
                             "w_sum": out_sum, "w_cnt": out_cnt})

    return bucketed_groups(prep, ["user_id"], _frame)


SQL_EVENTS_RANGE_SUM = """
WITH b AS (
  SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS e,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vc
  FROM events
)
SELECT event_id, user_id,
       CAST(SUM(vc) OVER w AS BIGINT) AS w_sum,
       CAST(COUNT(*) OVER w AS BIGINT) AS w_cnt
FROM b
WINDOW w AS (PARTITION BY user_id ORDER BY e
             RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW)
"""


def q_supplier_bin_packing(sf_dir: str):  # exact oracle (list-CTE FFD)
    """FIRST-FIT-DECREASING BIN PACKING per supplier: each lineitem's
    quantity is an item, bins have capacity 100; items sort (qty DESC,
    orderkey, linenumber) and each goes into the FIRST bin with room,
    else opens a new bin — the 11/9·OPT+1 classic behind container
    loading, shard packing and batch assembly, and the CAPACITY face of
    packing next to `doc_pack_sequences`' sequential token packing.
    Emits (l_suppkey, n_items, n_bins, asg_sum) where asg_sum =
    Σ bin_index·qty pins the full assignment, not just the bin count.
    Engine: one bucketed group shuffle + per-group first-fit scan;
    oracle: per-supplier sorted item LISTS walked one item per round
    through a recursive CTE, the bin-load list updated by list_transform
    at the first-fit index (vector-in-CTE device)."""
    from ..stages.relational import bucketed_groups

    li = _rp(sf_dir, "lineitem", ["l_suppkey", "l_orderkey", "l_linenumber",
                                  "l_quantity"])

    def _prep(batch: pa.Table) -> pa.Table:
        q = cents(batch["l_quantity"].to_numpy(zero_copy_only=False), 1)
        return pa.table({
            "l_suppkey": batch["l_suppkey"].cast(pa.int64()),
            "okey": batch["l_orderkey"].cast(pa.int64()),
            "lnum": batch["l_linenumber"].cast(pa.int64()),
            "qty": q})

    prep = li.map_batches(_prep, batch_format="pyarrow", batch_size=8192)

    def _pack(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["l_suppkey"], kind="mergesort")
        sk = d["l_suppkey"].to_numpy(np.int64)
        qty = d["qty"].to_numpy(np.int64)
        okey = d["okey"].to_numpy(np.int64)
        lnum = d["lnum"].to_numpy(np.int64)
        n = len(d)
        new_g = np.ones(n, dtype=bool)
        new_g[1:] = sk[1:] != sk[:-1]
        starts = np.flatnonzero(new_g)
        rows = []
        for a, b in zip(starts, np.append(starts[1:], n)):
            order = np.lexsort((lnum[a:b], okey[a:b], -qty[a:b]))
            bins: list[int] = []
            asg = 0
            for q in qty[a:b][order]:
                q = int(q)
                for bi in range(len(bins)):
                    if bins[bi] + q <= 100:
                        bins[bi] += q
                        asg += (bi + 1) * q
                        break
                else:
                    bins.append(q)
                    asg += len(bins) * q
            rows.append({"l_suppkey": int(sk[a]), "n_items": b - a,
                         "n_bins": len(bins), "asg_sum": asg})
        return pd.DataFrame(rows)

    return bucketed_groups(prep, ["l_suppkey"], _pack)


SQL_SUPPLIER_BIN_PACKING = """
WITH RECURSIVE it AS (
  SELECT l_suppkey, CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS qty,
         l_orderkey, l_linenumber
  FROM lineitem
),
lst AS (
  SELECT l_suppkey,
         list(qty ORDER BY qty DESC, l_orderkey, l_linenumber) AS items
  FROM it GROUP BY l_suppkey
),
pack AS (
  SELECT l_suppkey, items, 1 AS k, [items[1]] AS bins,
         CAST(items[1] AS BIGINT) AS asg
  FROM lst
  UNION ALL
  SELECT l_suppkey, items, k + 1,
         CASE WHEN fit IS NULL THEN list_append(bins, items[k + 1])
              ELSE list_transform(range(1, len(bins) + 1),
                     i -> CASE WHEN i = fit THEN bins[i] + items[k + 1]
                               ELSE bins[i] END)
         END,
         asg + COALESCE(fit, len(bins) + 1) * items[k + 1]
  FROM (
    SELECT *, list_filter(range(1, len(bins) + 1),
                          i -> bins[i] + items[k + 1] <= 100)[1] AS fit
    FROM pack WHERE k < len(items)
  )
)
SELECT l_suppkey, CAST(len(items) AS BIGINT) AS n_items,
       CAST(len(bins) AS BIGINT) AS n_bins, CAST(asg AS BIGINT) AS asg_sum
FROM pack WHERE k = len(items)
"""


def q_shape_visvalingam(sf_dir: str):  # exact oracle (list-CTE peeling)
    """VISVALINGAM–WHYATT line simplification per user trajectory — the
    area-based classic next to the distance-based RDP
    (`shape_simplify`): repeatedly remove the interior vertex with the
    smallest doubled triangle area |cross(prev→cur, prev→next)| (tie →
    smallest position) until ≤ 8 vertices remain; neighbors' areas
    re-evaluate after each removal, which is exactly what makes VW
    different from a one-pass filter. Emits (user_id, n_orig, n_kept,
    rem_chk) with rem_chk = Σ round·removed_area2 pinning the removal
    ORDER, not just the survivor set. Engine: one bucketed group shuffle
    + per-shape O(n²) peel (shapes are small); oracle: coordinate LISTS
    peeled one vertex per round in a recursive CTE (list_transform areas
    → list_position argmin → slice-concat removal)."""
    from ..stages import segments

    def _vw(uid: int, xy: np.ndarray):
        xyi = xy.astype(np.int64)
        xs = [int(v) for v in xyi[:, 0]]
        ys = [int(v) for v in xyi[:, 1]]
        n0 = len(xs)
        k, chk = 0, 0
        while len(xs) > 8:
            best_a, best_p = None, -1
            for p in range(1, len(xs) - 1):
                a2 = abs((xs[p] - xs[p - 1]) * (ys[p + 1] - ys[p - 1])
                         - (xs[p + 1] - xs[p - 1]) * (ys[p] - ys[p - 1]))
                if best_a is None or a2 < best_a:
                    best_a, best_p = a2, p
            k += 1
            chk += k * best_a
            del xs[best_p]
            del ys[best_p]
        return {"user_id": np.int64(uid), "n_orig": np.int64(n0),
                "n_kept": np.int64(len(xs)), "rem_chk": np.int64(chk)}

    return segments.per_shape(_event_shapes(sf_dir), _vw)


SQL_SHAPE_VISVALINGAM = """
WITH RECURSIVE pts AS (
  SELECT user_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gi,
         CAST((event_id * 48271 + user_id * 977) % 65536 AS BIGINT) AS x,
         CAST((event_id * 69621 + 13) % 65536 AS BIGINT) AS y
  FROM events
),
lst AS (
  SELECT user_id, list(x ORDER BY gi) AS xs, list(y ORDER BY gi) AS ys
  FROM pts GROUP BY user_id
),
vw AS (
  SELECT user_id, xs, ys, CAST(0 AS BIGINT) AS k,
         CAST(0 AS BIGINT) AS chk, len(xs) AS n0
  FROM lst
  UNION ALL
  SELECT user_id,
         list_concat(xs[1:pos - 1], xs[pos + 1:len(xs)]),
         list_concat(ys[1:pos - 1], ys[pos + 1:len(ys)]),
         k + 1, chk + (k + 1) * mn, n0
  FROM (
    SELECT *, list_aggregate(areas, 'min') AS mn,
           list_position(areas, list_aggregate(areas, 'min')) + 1 AS pos
    FROM (
      SELECT *, list_transform(range(2, len(xs)),
               p -> ABS((xs[p] - xs[p - 1]) * (ys[p + 1] - ys[p - 1])
                        - (xs[p + 1] - xs[p - 1]) * (ys[p] - ys[p - 1])))
             AS areas
      FROM vw WHERE len(xs) > 8
    )
  )
)
SELECT user_id, CAST(n0 AS BIGINT) AS n_orig,
       CAST(len(xs) AS BIGINT) AS n_kept, CAST(chk AS BIGINT) AS rem_chk
FROM vw WHERE len(xs) <= 8
"""


def q_user_peak_overlap(sf_dir: str):  # exact oracle (±1 sweep window)
    """PEAK CONCURRENT OVERLAP per user (maximum interval stabbing): the
    same variable event windows as ``user_max_nonoverlap``, swept as
    +1-at-start / −1-at-end deltas in (t, delta) order — ends sort before
    starts at equal t, the [s,e) half-open convention — running-sum max
    = the peak number of simultaneously open windows, plus the EARLIEST
    µs instant attaining it. The "peak load / max concurrency" staffing
    metric, completing the interval trio (union coverage, max
    non-overlap selection, peak stabbing). Engine: one bucketed group
    shuffle + a vectorized cummax per user. Emits
    (user_id, peak, first_peak_t)."""
    from ..stages.relational import bucketed_groups

    ev = _rp(sf_dir, "events", ["user_id", "ts", "event_id"])

    def _deltas(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        e = s + (eid % 7 + 1) * 60_000_000
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "user_id": np.concatenate([uid, uid]),
            "t": np.concatenate([s, e]),
            "d": np.concatenate([np.ones(len(s), np.int64),
                                 -np.ones(len(s), np.int64)])})

    dl = ev.map_batches(_deltas, batch_format="pyarrow", batch_size=8192)

    def _sweep(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["user_id", "t", "d"], kind="mergesort")
        uid = d["user_id"].to_numpy()
        t = d["t"].to_numpy(np.int64)
        dv = d["d"].to_numpy(np.int64)
        n = len(d)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(new_user)
        users, peaks, firsts = [], [], []
        for a, b in zip(starts, np.append(starts[1:], n)):
            run = np.cumsum(dv[a:b])
            p = int(run.max())
            fi = int(np.argmax(run == p))
            users.append(int(uid[a]))
            peaks.append(p)
            firsts.append(int(t[a + fi]))
        return pd.DataFrame({"user_id": np.asarray(users, np.int64),
                             "peak": np.asarray(peaks, np.int64),
                             "first_peak_t": np.asarray(firsts, np.int64)})

    return bucketed_groups(dl, ["user_id"], _sweep)


SQL_USER_PEAK_OVERLAP = """
WITH iv AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS s,
         CAST(epoch_us(ts) AS BIGINT) + (event_id % 7 + 1) * 60000000 AS e
  FROM events
),
dl AS (
  SELECT user_id, s AS t, CAST(1 AS BIGINT) AS d FROM iv
  UNION ALL
  SELECT user_id, e, CAST(-1 AS BIGINT) FROM iv
),
run AS (
  SELECT user_id, t, d,
         SUM(d) OVER (PARTITION BY user_id ORDER BY t, d
                      ROWS UNBOUNDED PRECEDING) AS r
  FROM dl
),
pk AS (SELECT user_id, MAX(r) AS peak FROM run GROUP BY user_id)
SELECT run.user_id, CAST(pk.peak AS BIGINT) AS peak,
       CAST(MIN(run.t) AS BIGINT) AS first_peak_t
FROM run JOIN pk ON pk.user_id = run.user_id AND run.r = pk.peak
GROUP BY run.user_id, pk.peak
"""


def q_customer_edd_lateness(sf_dir: str):  # exact oracle (EDD cumsum)
    """EARLIEST-DUE-DATE single-machine scheduling per customer
    (Jackson's rule — EDD provably minimizes maximum lateness): each
    order is a job with processing time p = (o_orderkey % 7 + 1) days
    and due date d = o_orderdate + 14 days; jobs run in (due, orderkey)
    order from the customer's earliest order date; emits the maximum
    lateness L_max = max(completion − due) in µs and the finishing
    makespan — the ops-research counterpart of the greedy interval ops.
    One bucketed group shuffle + vectorized per-group cumsum; oracle is
    a window cumsum over the same order."""
    from ..stages.relational import bucketed_groups

    DAY = 86_400_000_000
    od = _rp(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def _jobs(batch: pa.Table) -> pa.Table:
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = batch["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "o_custkey": batch["o_custkey"].cast(pa.int64()),
            "o_orderkey": ok, "t0": t,
            "p": (ok % 7 + 1) * DAY, "due": t + 14 * DAY})

    jobs = od.map_batches(_jobs, batch_format="pyarrow", batch_size=8192)

    def _edd(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["o_custkey", "due", "o_orderkey"],
                          kind="mergesort")
        ck = d["o_custkey"].to_numpy(np.int64)
        p = d["p"].to_numpy(np.int64)
        due = d["due"].to_numpy(np.int64)
        t0 = d["t0"].to_numpy(np.int64)
        n = len(d)
        new_g = np.ones(n, dtype=bool)
        new_g[1:] = ck[1:] != ck[:-1]
        starts = np.flatnonzero(new_g)
        rows = []
        for a, b in zip(starts, np.append(starts[1:], n)):
            start = int(t0[a:b].min())
            comp = start + np.cumsum(p[a:b])
            lmax = int((comp - due[a:b]).max())
            rows.append({"o_custkey": int(ck[a]), "n_jobs": b - a,
                         "l_max": lmax, "makespan": int(comp[-1] - start)})
        return pd.DataFrame(rows)

    return bucketed_groups(jobs, ["o_custkey"], _edd)


SQL_CUSTOMER_EDD_LATENESS = """
WITH j AS (
  SELECT o_custkey, o_orderkey,
         CAST(epoch_us(o_orderdate) AS BIGINT) AS t0,
         (o_orderkey % 7 + 1) * 86400000000 AS p,
         CAST(epoch_us(o_orderdate) AS BIGINT) + 14 * 86400000000 AS due
  FROM orders
),
s AS (
  SELECT o_custkey, o_orderkey, p, due,
         MIN(t0) OVER (PARTITION BY o_custkey) AS start,
         SUM(p) OVER (PARTITION BY o_custkey ORDER BY due, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM j
)
SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_jobs,
       CAST(MAX(start + cum - due) AS BIGINT) AS l_max,
       CAST(MAX(cum) AS BIGINT) AS makespan
FROM s GROUP BY o_custkey
"""


def q_image_feather_blend(sf_dir: str):  # exact oracle (1-D mirror join)
    """PANORAMA FEATHER BLEND checkpoints through the decode path
    (``media.image_feather_blend``): each image blends against its
    horizontal mirror under the linear ramp a(j) = ⌊j·1024/(w−1)⌋ in
    floor fixed point — the seam-feathering kernel every stitcher runs
    where two frames overlap. Per-channel sums + a column-weighted R sum
    (only a column weight can pin the ramp's direction). On the fixture
    R blends f(j) against f(w−1−j) — a 1-D self-join; G and B are mirror-
    invariant and must pass through EXACTLY (the floor of 1024·g/1024)."""
    docs = _rp(sf_dir, "documents", ["doc_id"])

    synth = docs.map_batches(_image_fixture_synth, batch_format="pyarrow", batch_size=512)
    return mstage.image_feather_blend(synth, batch_size=512)


SQL_IMAGE_FEATHER_BLEND = """
WITH """ + _SQL_IM3 + """,
rq AS (
  SELECT image_id, j, w,
         CASE WHEN fi = 2
              THEN ((br + (j * 55) // (w - 1)) // 4) * 4
                   + ((br + (j * 55) // (w - 1)) // 4) // 16
              ELSE br + (j * 55) // (w - 1) END AS v
  FROM im, (SELECT unnest(range(40)) AS j) js WHERE j < w
),
rb AS (
  SELECT a.image_id, a.j,
         ((a.j * 1024) // (a.w - 1) * a.v
          + (1024 - (a.j * 1024) // (a.w - 1)) * b.v) // 1024 AS m
  FROM rq a JOIN rq b ON b.image_id = a.image_id AND b.j = a.w - 1 - a.j
),
rs AS (
  SELECT image_id, SUM(m) AS rowsum, SUM((j + 1) * m) AS wrowsum
  FROM rb GROUP BY image_id
),
gq AS (
  SELECT image_id, r,
         CASE WHEN fi = 2
              THEN ((bg + (r * 41) // (h - 1)) // 4) * 4
                   + ((bg + (r * 41) // (h - 1)) // 4) // 16
              ELSE bg + (r * 41) // (h - 1) END AS v
  FROM im, (SELECT unnest(range(24)) AS r) rs2 WHERE r < h
),
gs AS (SELECT image_id, SUM(v) AS colsum FROM gq GROUP BY image_id)
SELECT im.image_id,
       CAST(h * rs.rowsum AS BIGINT) AS sum_r,
       CAST(w * gs.colsum AS BIGINT) AS sum_g,
       CAST(w * h * (CASE WHEN fi = 2 THEN (bb // 4) * 4 + (bb // 4) // 16
                          ELSE bb END) AS BIGINT) AS sum_b,
       CAST(h * rs.wrowsum AS BIGINT) AS wsum_r
FROM im JOIN rs ON rs.image_id = im.image_id
        JOIN gs ON gs.image_id = im.image_id
"""


def q_image_radial_profile(sf_dir: str):  # exact oracle (ring bucketing)
    """CHEBYSHEV RADIAL PROFILE through the decode path
    (``media.image_radial_profile``): per-(image, ring) pixel count and
    luma sum, rings by max(|i−ci|, |j−cj|) around the center — the
    vignetting / lens-falloff / border screen of image curation. The
    oracle buckets the 1-D×1-D fixture grids by GREATEST of the two
    axis distances; the kernel is a general 2-D bincount."""
    docs = _rp(sf_dir, "documents", ["doc_id"])

    synth = docs.map_batches(_image_fixture_synth, batch_format="pyarrow", batch_size=512)
    return mstage.image_radial_profile(synth, batch_size=512)


SQL_IMAGE_RADIAL_PROFILE = """
WITH """ + _SQL_IM3 + """,
rq AS (
  SELECT image_id, j, w,
         CASE WHEN fi = 2
              THEN ((br + (j * 55) // (w - 1)) // 4) * 4
                   + ((br + (j * 55) // (w - 1)) // 4) // 16
              ELSE br + (j * 55) // (w - 1) END AS vr
  FROM im, (SELECT unnest(range(40)) AS j) js WHERE j < w
),
gq AS (
  SELECT image_id, r, h,
         CASE WHEN fi = 2
              THEN ((bg + (r * 41) // (h - 1)) // 4) * 4
                   + ((bg + (r * 41) // (h - 1)) // 4) // 16
              ELSE bg + (r * 41) // (h - 1) END AS vg,
         CASE WHEN fi = 2 THEN ((bb // 4) * 4 + (bb // 4) // 16)
              ELSE bb END AS vb
  FROM im JOIN (SELECT unnest(range(24)) AS r) rs2 ON r < h
),
px AS (
  SELECT q.image_id,
         GREATEST(ABS(g.r - (g.h - 1) // 2), ABS(q.j - (q.w - 1) // 2))
           AS ring,
         q.vr + g.vg + g.vb AS luma
  FROM rq q JOIN gq g ON g.image_id = q.image_id
)
SELECT image_id, CAST(ring AS BIGINT) AS ring,
       CAST(COUNT(*) AS BIGINT) AS n_px,
       CAST(SUM(luma) AS BIGINT) AS luma_sum
FROM px GROUP BY image_id, ring
"""


def q_supplier_knapsack(sf_dir: str):  # exact oracle (DP-vector CTE)
    """0/1 KNAPSACK per supplier by exact dynamic programming: items are
    the supplier's lineitems (weight = quantity 1..50, value = price in
    whole dollars), capacity 100; the DP vector best[c] = max value at
    weight ≤ c advances one item per round — THE textbook
    pseudo-polynomial DP, and the value-optimal counterpart of
    `supplier_bin_packing`'s count-minimizing FFD. Emits (l_suppkey,
    n_items, best_value, best_weight) with best_weight = the SMALLEST
    capacity attaining best_value (pins the DP table, not just the
    optimum). Engine: one bucketed group shuffle + per-group vectorized
    DP (numpy maximum over the shifted vector per item); oracle: the
    101-slot DP vector carried as a LIST through a recursive CTE, one
    item per round (vector-in-CTE device)."""
    from ..stages.relational import bucketed_groups

    li = _rp(sf_dir, "lineitem", ["l_suppkey", "l_orderkey", "l_linenumber",
                                  "l_quantity", "l_extendedprice"])

    def _prep(batch: pa.Table) -> pa.Table:
        q = cents(batch["l_quantity"].to_numpy(zero_copy_only=False), 1)
        v = cents(batch["l_extendedprice"].to_numpy(zero_copy_only=False)) \
            // 100
        return pa.table({
            "l_suppkey": batch["l_suppkey"].cast(pa.int64()),
            "okey": batch["l_orderkey"].cast(pa.int64()),
            "lnum": batch["l_linenumber"].cast(pa.int64()),
            "wt": q, "val": v})

    prep = li.map_batches(_prep, batch_format="pyarrow", batch_size=8192)
    CAP = 100

    def _dp(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["l_suppkey", "okey", "lnum"], kind="mergesort")
        sk = d["l_suppkey"].to_numpy(np.int64)
        wt = d["wt"].to_numpy(np.int64)
        val = d["val"].to_numpy(np.int64)
        n = len(d)
        new_g = np.ones(n, dtype=bool)
        new_g[1:] = sk[1:] != sk[:-1]
        starts = np.flatnonzero(new_g)
        rows = []
        for a, b in zip(starts, np.append(starts[1:], n)):
            best = np.zeros(CAP + 1, np.int64)
            for i in range(a, b):
                w, v = int(wt[i]), int(val[i])
                if w <= CAP:
                    shifted = np.concatenate([best[:w] * 0, best[:CAP + 1 - w] + v])
                    # taking item i is only legal where c >= w
                    shifted[:w] = -1
                    best = np.maximum(best, shifted)
            bv = int(best.max())
            bw = int(np.argmax(best == bv))
            rows.append({"l_suppkey": int(sk[a]), "n_items": b - a,
                         "best_value": bv, "best_weight": bw})
        return pd.DataFrame(rows)

    return bucketed_groups(prep, ["l_suppkey"], _dp)


SQL_SUPPLIER_KNAPSACK = """
WITH RECURSIVE it AS (
  SELECT l_suppkey, CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS wt,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) // 100 AS val,
         l_orderkey, l_linenumber
  FROM lineitem
),
lst AS (
  SELECT l_suppkey,
         list(wt ORDER BY l_orderkey, l_linenumber) AS ws,
         list(val ORDER BY l_orderkey, l_linenumber) AS vs
  FROM it GROUP BY l_suppkey
),
dp AS (
  SELECT l_suppkey, ws, vs, 0 AS k,
         list_transform(range(0, 101), c -> CAST(0 AS BIGINT)) AS best
  FROM lst
  UNION ALL
  SELECT l_suppkey, ws, vs, k + 1,
         list_transform(range(1, 102),
           ci -> CASE WHEN ci - 1 >= ws[k + 1]
                          AND best[ci - ws[k + 1]] + vs[k + 1] > best[ci]
                      THEN best[ci - ws[k + 1]] + vs[k + 1]
                      ELSE best[ci] END)
  FROM dp WHERE k < len(ws)
)
SELECT l_suppkey, CAST(len(ws) AS BIGINT) AS n_items,
       CAST(list_aggregate(best, 'max') AS BIGINT) AS best_value,
       CAST(list_position(best, list_aggregate(best, 'max')) - 1 AS BIGINT)
         AS best_weight
FROM dp WHERE k = len(ws)
"""


def q_image_kuwahara(sf_dir: str):  # exact oracle (1-D window argmin)
    """EDGE-PRESERVING KUWAHARA FILTER checkpoints through the decode
    path (``media.image_kuwahara``): 5×5 window, four overlapping 3×3
    quadrants, per pixel the quadrant with smallest division-free
    variance 9Σx²−(Σx)² wins (NW,NE,SW,SE tie order) and contributes its
    floor mean — smoothing that never averages across an edge, which no
    linear kernel can imitate. On the factorized fixture the quadrant
    variances collapse per axis (left/right column windows for R, top/
    bottom row windows for G, flat B → NW tie), so the oracle is 1-D
    ROWS-window sums + the same ≤ tie rule; the kernel is the general
    2-D integral-image argmin."""
    docs = _rp(sf_dir, "documents", ["doc_id"])

    synth = docs.map_batches(_image_fixture_synth, batch_format="pyarrow", batch_size=512)
    return mstage.image_kuwahara(synth, batch_size=512)


SQL_IMAGE_KUWAHARA = """
WITH """ + _SQL_IM3 + """,
rq AS (
  SELECT image_id, j, w,
         CASE WHEN fi = 2
              THEN ((br + (j * 55) // (w - 1)) // 4) * 4
                   + ((br + (j * 55) // (w - 1)) // 4) // 16
              ELSE br + (j * 55) // (w - 1) END AS v
  FROM im, (SELECT unnest(range(40)) AS j) js WHERE j < w
),
rw AS (
  SELECT image_id, j, w,
         SUM(v) OVER (PARTITION BY image_id ORDER BY j
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS sl,
         SUM(v * v) OVER (PARTITION BY image_id ORDER BY j
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ql,
         SUM(v) OVER (PARTITION BY image_id ORDER BY j
                      ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS sr,
         SUM(v * v) OVER (PARTITION BY image_id ORDER BY j
                          ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS qr
  FROM rq
),
rs AS (
  SELECT image_id,
         SUM(CASE WHEN 3 * ql - sl * sl <= 3 * qr - sr * sr
                  THEN (3 * sl) // 9 ELSE (3 * sr) // 9 END) AS rowsum
  FROM rw WHERE j >= 2 AND j <= w - 3 GROUP BY image_id
),
gq AS (
  SELECT image_id, r, h,
         CASE WHEN fi = 2
              THEN ((bg + (r * 41) // (h - 1)) // 4) * 4
                   + ((bg + (r * 41) // (h - 1)) // 4) // 16
              ELSE bg + (r * 41) // (h - 1) END AS v
  FROM im, (SELECT unnest(range(24)) AS r) rs2 WHERE r < h
),
gw AS (
  SELECT image_id, r, h,
         SUM(v) OVER (PARTITION BY image_id ORDER BY r
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS st,
         SUM(v * v) OVER (PARTITION BY image_id ORDER BY r
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS qt,
         SUM(v) OVER (PARTITION BY image_id ORDER BY r
                      ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS sb,
         SUM(v * v) OVER (PARTITION BY image_id ORDER BY r
                          ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS qb
  FROM gq
),
gs AS (
  SELECT image_id,
         SUM(CASE WHEN 3 * qt - st * st <= 3 * qb - sb * sb
                  THEN (3 * st) // 9 ELSE (3 * sb) // 9 END) AS colsum
  FROM gw WHERE r >= 2 AND r <= h - 3 GROUP BY image_id
)
SELECT im.image_id,
       CAST(h - 4 AS BIGINT) AS int_h, CAST(w - 4 AS BIGINT) AS int_w,
       CAST((h - 4) * rs.rowsum AS BIGINT) AS kw_r,
       CAST((w - 4) * gs.colsum AS BIGINT) AS kw_g,
       CAST((h - 4) * (w - 4) *
            (CASE WHEN fi = 2 THEN (bb // 4) * 4 + (bb // 4) // 16
                  ELSE bb END) AS BIGINT) AS kw_b
FROM im JOIN rs ON rs.image_id = im.image_id
        JOIN gs ON gs.image_id = im.image_id
"""


def q_nation_emd_drift(sf_dir: str):  # exact oracle (cumsum |diff|)
    """1-D EARTH MOVER'S DISTANCE of each nation's monthly order profile
    from the GLOBAL profile — the distribution-drift screen of dataset
    curation (per-source seasonality skew), exact by cross-multiplying
    away the normalizations: emd12 = Σ_m |cum_n(m)·T − cum_g(m)·T_n|
    over the 12 month buckets (T = global total, T_n = nation total);
    the Wasserstein-1 distance on the month line, division-free. One
    (nation, month) combiner shuffle; the 12-bucket epilogue runs on the
    nations×12 table. Emits (n_name, t_n, emd12)."""
    od = _rp(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    ck = cust["c_custkey"].to_numpy()
    nk = cust["c_nationkey"].to_numpy()
    c2n = dict(zip(ck.tolist(), nk.tolist()))
    n2name = dict(zip(nat["n_nationkey"].to_numpy().tolist(),
                      nat["n_name"].to_pylist()))
    c2n_ref = ray.put(c2n)

    def _mo(batch: pa.Table) -> pa.Table:
        from ..stages.util import cached_state

        lookup = cached_state(c2n_ref, lambda d: d, token="emd.c2n")
        ckb = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        mo = (ts.astype("datetime64[us]").astype("datetime64[M]")
              .astype(np.int64) % 12 + 1)
        nk2 = np.array([lookup[int(c)] for c in ckb], np.int64)
        return pa.table({"nk": nk2, "mo": mo})

    pairs = od.map_batches(_mo, batch_format="pyarrow", batch_size=8192)
    counts = rel.partial_groupby_sum(pairs, ["nk", "mo"], [], count_as="c",
                                     est_rows=_nrows(sf_dir, "orders"))
    df = counts.to_pandas()  # nations×12-bounded
    piv = df.pivot_table(index="nk", columns="mo", values="c",
                         aggfunc="sum", fill_value=0)
    piv = piv.reindex(columns=range(1, 13), fill_value=0).astype(np.int64)
    g = piv.sum(axis=0).to_numpy(np.int64)
    t_all = int(g.sum())
    cum_g = np.cumsum(g)
    rows = []
    for nk2, row in piv.iterrows():
        cn = row.to_numpy(np.int64)
        t_n = int(cn.sum())
        cum_n = np.cumsum(cn)
        emd = int(np.abs(cum_n * t_all - cum_g * t_n).sum())
        rows.append({"n_name": n2name[int(nk2)], "t_n": t_n, "emd12": emd})
    return pd.DataFrame(rows)


SQL_NATION_EMD_DRIFT = """
WITH mo AS (
  SELECT n.n_name,
         CAST(EXTRACT(month FROM o.o_orderdate) AS BIGINT) AS m
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
),
nm AS (
  SELECT nn.n_name, mm.m, COUNT(mo.m) AS c
  FROM (SELECT DISTINCT n_name FROM mo) nn
  CROSS JOIN (SELECT unnest(range(1, 13)) AS m) mm
  LEFT JOIN mo ON mo.n_name = nn.n_name AND mo.m = mm.m
  GROUP BY nn.n_name, mm.m
),
gm AS (SELECT m, SUM(c) AS g FROM nm GROUP BY m),
gc AS (SELECT m, SUM(g) OVER (ORDER BY m) AS cum_g FROM gm),
cums AS (
  SELECT nm.n_name, nm.m,
         SUM(nm.c) OVER (PARTITION BY nm.n_name ORDER BY nm.m) AS cum_n,
         gc.cum_g
  FROM nm JOIN gc ON gc.m = nm.m
),
tot AS (
  SELECT n_name, SUM(c) AS t_n FROM nm GROUP BY n_name
),
tall AS (SELECT SUM(g) AS t FROM gm)
SELECT c.n_name, CAST(t.t_n AS BIGINT) AS t_n,
       CAST(SUM(ABS(c.cum_n * a.t - c.cum_g * t.t_n)) AS BIGINT) AS emd12
FROM cums c JOIN tot t ON t.n_name = c.n_name CROSS JOIN tall a
GROUP BY c.n_name, t.t_n
"""


def q_tile_nn_tour(sf_dir: str):  # exact oracle (list-CTE greedy walk)
    """NEAREST-NEIGHBOR TOUR construction over the depot tiles (every
    50th tile): start at the lowest id, repeatedly hop to the nearest
    unvisited depot (key dist², tie smallest id) until all are visited —
    the classic TSP route-construction heuristic every delivery/survey
    planner starts from. Emits ONE row (n_tiles, tour_len2, ord_chk)
    with ord_chk = Σ step·tile_id pinning the full visit ORDER. The
    depot set is dimension-sized, so the engine walk is a vectorized
    driver epilogue (O(P) numpy argmin per step); the oracle carries
    alive coordinate/id LISTS through a recursive CTE with a composite
    (d²·2²⁰ + id) argmin key (ids < 2²⁰ by construction)."""
    t = td.tiles_table(sf_dir)
    tid = t["tile_id"].to_numpy().astype(np.int64)
    cx = t["cx"].to_numpy().astype(np.int64)
    cy = t["cy"].to_numpy().astype(np.int64)
    pm = tid % 50 == 0
    tid, cx, cy = tid[pm], cx[pm], cy[pm]
    order = np.argsort(tid)
    tid, cx, cy = tid[order], cx[order], cy[order]
    n = len(tid)
    alive = np.ones(n, dtype=bool)
    cur = 0
    alive[cur] = False
    tour_len2 = 0
    chk = int(tid[0])
    for k in range(2, n + 1):
        d2 = (cx - cx[cur]) ** 2 + (cy - cy[cur]) ** 2
        key = d2 * 1048576 + tid
        key[~alive] = np.iinfo(np.int64).max
        nxt = int(np.argmin(key))
        tour_len2 += int(d2[nxt])
        chk += k * int(tid[nxt])
        alive[nxt] = False
        cur = nxt
    return pd.DataFrame({"n_tiles": [n], "tour_len2": [tour_len2],
                         "ord_chk": [chk]})


SQL_TILE_NN_TOUR = f"""WITH RECURSIVE tiles AS ({td.TILES_SQL}),
pn AS (
  SELECT tile_id, cx, cy FROM tiles WHERE tile_id % 50 = 0
),
lst AS (
  SELECT list(tile_id ORDER BY tile_id) AS ids,
         list(cx ORDER BY tile_id) AS xs,
         list(cy ORDER BY tile_id) AS ys,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM pn
),
walk AS (
  SELECT ids[2:len(ids)] AS ids, xs[2:len(xs)] AS xs, ys[2:len(ys)] AS ys,
         n, xs[1] AS curx, ys[1] AS cury, 1 AS k,
         CAST(0 AS BIGINT) AS tour_len2, CAST(ids[1] AS BIGINT) AS chk
  FROM lst
  UNION ALL
  SELECT list_concat(ids[1:pos - 1], ids[pos + 1:len(ids)]),
         list_concat(xs[1:pos - 1], xs[pos + 1:len(xs)]),
         list_concat(ys[1:pos - 1], ys[pos + 1:len(ys)]),
         n, xs[pos], ys[pos], k + 1,
         tour_len2 + (xs[pos] - curx) * (xs[pos] - curx)
                   + (ys[pos] - cury) * (ys[pos] - cury),
         chk + (k + 1) * ids[pos]
  FROM (
    SELECT *, list_position(keys, list_aggregate(keys, 'min')) AS pos
    FROM (
      SELECT *, list_transform(range(1, len(ids) + 1),
               i -> ((xs[i] - curx) * (xs[i] - curx)
                     + (ys[i] - cury) * (ys[i] - cury)) * 1048576 + ids[i])
             AS keys
      FROM walk WHERE len(ids) > 0
    )
  )
)
SELECT n AS n_tiles, CAST(tour_len2 AS BIGINT) AS tour_len2,
       CAST(chk AS BIGINT) AS ord_chk
FROM walk WHERE len(ids) = 0
"""


def q_doc_bpe_merges(sf_dir: str):  # exact oracle (unrolled merge rounds)
    """The full BPE TRAINER LOOP (``textops.bpe_merge_rounds``, 3
    rounds): count adjacent token pairs corpus-wide, pick the single
    deterministic argmax merge (count desc, pair asc), RE-TOKENIZE every
    document by greedy left-to-right application (never overlapping:
    "a a a" + (a,a) → [a_a, a]), repeat — the iterative half
    `doc_bpe_pairs` stops short of, and the actual tokenizer-training
    algorithm. Emits (round, pair, n_merged). Oracle: three unrolled
    rounds; the greedy re-tokenization replays as hit runs → odd-rank
    keeps → list_transform rebuild with list_contains."""
    docs = _rp(sf_dir, "documents", ["text"])
    return textops.bpe_merge_rounds(docs, rounds=3,
                                    est_rows=_nrows(sf_dir, "documents"))


def _bpe_round_sql(r: int) -> str:
    return f""",
cnt{r} AS (
  SELECT w[j] || ' ' || w[j + 1] AS pair, COUNT(*) AS n
  FROM ws{r}, (SELECT unnest(range(1, 200)) AS j) js
  WHERE j < len(w) GROUP BY pair
),
top{r} AS (
  SELECT pair, string_split(pair, ' ')[1] AS a,
         string_split(pair, ' ')[2] AS b
  FROM cnt{r} ORDER BY n DESC, pair LIMIT 1
),
hit{r} AS (
  SELECT ws.doc_id, j
  FROM ws{r} ws, (SELECT unnest(range(1, 200)) AS j) js, top{r} t
  WHERE j < len(w) AND w[j] = t.a AND w[j + 1] = t.b
),
keep{r} AS (
  SELECT doc_id, j FROM (
    SELECT doc_id, j,
           ROW_NUMBER() OVER (PARTITION BY doc_id, j - rn ORDER BY j) AS rr
    FROM (SELECT doc_id, j,
                 ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY j) AS rn
          FROM hit{r})
  ) WHERE rr % 2 = 1
),
kl{r} AS (SELECT doc_id, list(j ORDER BY j) AS ks
          FROM keep{r} GROUP BY doc_id),
ws{r + 1} AS (
  SELECT ws.doc_id,
         CASE WHEN kl.ks IS NULL THEN ws.w ELSE
           list_filter(list_transform(range(1, len(ws.w) + 1),
             j -> CASE WHEN list_contains(kl.ks, j)
                       THEN t.a || '_' || t.b
                       WHEN list_contains(kl.ks, j - 1) THEN NULL
                       ELSE ws.w[j] END), x -> x IS NOT NULL)
         END AS w
  FROM ws{r} ws
  LEFT JOIN kl{r} kl ON kl.doc_id = ws.doc_id
  CROSS JOIN top{r} t
),
nm{r} AS (SELECT CAST(COUNT(*) AS BIGINT) AS nm FROM keep{r})"""


SQL_DOC_BPE_MERGES = """
WITH ws1 AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[0-9a-z_]+') AS w
  FROM documents
)""" + "".join(_bpe_round_sql(r) for r in (1, 2, 3)) + """
SELECT 1 AS round, top1.pair, nm1.nm AS n_merged FROM top1, nm1
UNION ALL
SELECT 2, top2.pair, nm2.nm FROM top2, nm2
UNION ALL
SELECT 3, top3.pair, nm3.nm FROM top3, nm3
"""


def q_nation_queue_replay(sf_dir: str):  # exact oracle (cummax prefix trick)
    """SINGLE-SERVER FIFO QUEUE REPLAY per nation (the queueing-theory
    waiting-time recurrence C_i = max(A_i, C_{i−1}) + p_i): orders arrive
    at o_orderdate and need (o_orderkey % 5 + 1) days of service at the
    nation's desk, FIFO in (arrival, orderkey) order. The sequential
    recurrence VECTORIZES exactly via the max-plus prefix trick
    C_i = P_i + cummax_j≤i(A_j − P_{j−1}) (P = service prefix sums), so
    the engine needs one cumsum + one cummax per group — no scan loop.
    Emits per nation (n_jobs, total_wait, max_wait) in exact µs, wait =
    C − A − p. Oracle: the same identity as window cumsum + running MAX."""
    from ..stages.relational import bucketed_groups

    DAY = 86_400_000_000
    od = _rp(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    c2n = dict(zip(cust["c_custkey"].to_numpy().tolist(),
                   cust["c_nationkey"].to_numpy().tolist()))
    c2n_ref = ray.put(c2n)

    def _jobs(batch: pa.Table) -> pa.Table:
        from ..stages.util import cached_state

        lookup = cached_state(c2n_ref, lambda d: d, token="queue.c2n")
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        arr = batch["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        nk = np.array([lookup[int(c)] for c in ck], np.int64)
        return pa.table({"nk": nk, "o_orderkey": ok, "arr": arr,
                         "p": (ok % 5 + 1) * DAY})

    jobs = od.map_batches(_jobs, batch_format="pyarrow", batch_size=8192)

    def _replay(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["nk", "arr", "o_orderkey"], kind="mergesort")
        nk = d["nk"].to_numpy(np.int64)
        arr = d["arr"].to_numpy(np.int64)
        p = d["p"].to_numpy(np.int64)
        n = len(d)
        new_g = np.ones(n, dtype=bool)
        new_g[1:] = nk[1:] != nk[:-1]
        starts = np.flatnonzero(new_g)
        rows = []
        for a, b in zip(starts, np.append(starts[1:], n)):
            pp = np.cumsum(p[a:b])
            base = arr[a:b] - np.concatenate([[0], pp[:-1]])
            comp = pp + np.maximum.accumulate(base)
            wait = comp - arr[a:b] - p[a:b]
            rows.append({"nk": int(nk[a]), "n_jobs": b - a,
                         "total_wait": int(wait.sum()),
                         "max_wait": int(wait.max())})
        return pd.DataFrame(rows)

    return bucketed_groups(jobs, ["nk"], _replay)


SQL_NATION_QUEUE_REPLAY = """
WITH j AS (
  SELECT c.c_nationkey AS nk, o.o_orderkey,
         CAST(epoch_us(o.o_orderdate) AS BIGINT) AS arr,
         (o.o_orderkey % 5 + 1) * 86400000000 AS p
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
s1 AS (
  SELECT nk, o_orderkey, arr, p,
         SUM(p) OVER (PARTITION BY nk ORDER BY arr, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS pp
  FROM j
),
s AS (
  SELECT nk, arr, p, pp,
         MAX(arr - (pp - p)) OVER (PARTITION BY nk ORDER BY arr, o_orderkey
                                   ROWS UNBOUNDED PRECEDING) AS base_max
  FROM s1
),
waits AS (
  SELECT nk, pp + base_max - arr - p AS wait FROM s
)
SELECT nk, CAST(COUNT(*) AS BIGINT) AS n_jobs,
       CAST(SUM(wait) AS BIGINT) AS total_wait,
       CAST(MAX(wait) AS BIGINT) AS max_wait
FROM waits GROUP BY nk
"""


def q_part_revenue_gini(sf_dir: str):  # exact oracle (sorted-rank pieces)
    """REVENUE CONCENTRATION (Lorenz/Gini) across parts as exact integer
    pieces: per-part revenue cents x sorted ascending (tie p_partkey),
    gini_num = Σ(2i − n − 1)·x_(i) (so Gini = gini_num / (n·Σx)) — the
    "does 1 % of parts earn 90 % of revenue" concentration screen, the
    economist's counterpart of `part_abc_classes`. One combiner-first
    per-part rollup; the rank pass runs on the parts-bounded table.
    Emits ONE row (n_parts, total_c, gini_num)."""
    li = _rp(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"])

    def _prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": batch["l_partkey"].cast(pa.int64()),
            "rev_c": cents(batch["l_extendedprice"]
                           .to_numpy(zero_copy_only=False))})

    prep = li.map_batches(_prep, batch_format="pyarrow", batch_size=8192)
    sums = rel.partial_groupby_sum(prep, ["l_partkey"], ["rev_c"],
                                   est_rows=_nrows(sf_dir, "lineitem"))
    df = sums.to_pandas()  # parts-bounded
    d = df.sort_values(["rev_c", "l_partkey"], kind="mergesort")
    x = d["rev_c"].to_numpy(np.int64)
    n = len(x)
    i = np.arange(1, n + 1, dtype=np.int64)
    gini_num = int(((2 * i - n - 1) * x).sum())
    return pd.DataFrame({"n_parts": [n], "total_c": [int(x.sum())],
                         "gini_num": [gini_num]})


SQL_PART_REVENUE_GINI = """
WITH pr AS (
  SELECT l_partkey,
         SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS rev_c
  FROM lineitem GROUP BY l_partkey
),
rk AS (
  SELECT rev_c,
         ROW_NUMBER() OVER (ORDER BY rev_c, l_partkey) AS i,
         COUNT(*) OVER () AS n
  FROM pr
)
SELECT CAST(MAX(n) AS BIGINT) AS n_parts,
       CAST(SUM(rev_c) AS BIGINT) AS total_c,
       CAST(SUM((2 * i - n - 1) * rev_c) AS BIGINT) AS gini_num
FROM rk
"""


def q_doc_lz78_complexity(sf_dir: str):  # exact oracle (dict-list CTE)
    """LZ78 COMPLEXITY per document (every 10th doc): parse the word-
    token stream left-to-right, extending the current phrase while it is
    already in the dictionary and otherwise adding it (+1 phrase) and
    resetting; a trailing unfinished phrase counts once — the
    compression-based NOVELTY metric of corpus curation (template/spam
    text parses into few long phrases, diverse prose into many), the
    dictionary-coding face of `image_rle_profile`'s run coding. Engine:
    one bucketed shuffle, per-doc set-based parse (O(tokens)); oracle:
    the dictionary carried as a string LIST through a recursive CTE, one
    token per round. Emits (doc_id, n_tokens, lz78)."""
    from ..functions.text import _WORD_ASCII_RE
    from ..stages.relational import bucketed_groups

    docs = _rp(sf_dir, "documents", ["doc_id", "text"])

    def _keep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(ids % 10 == 0))

    kept = docs.map_batches(_keep, batch_format="pyarrow", batch_size=8192)

    def _parse(g: pd.DataFrame) -> pd.DataFrame:
        ids, ntok, lz = [], [], []
        for did, text in zip(g["doc_id"].to_numpy(np.int64), g["text"]):
            ws = _WORD_ASCII_RE.findall((text or "").lower())
            seen: set[str] = set()
            cur = ""
            cnt = 0
            for w in ws:
                cand = w if not cur else cur + " " + w
                if cand in seen:
                    cur = cand
                else:
                    seen.add(cand)
                    cnt += 1
                    cur = ""
            ids.append(int(did))
            ntok.append(len(ws))
            lz.append(cnt + (1 if cur else 0))
        return pd.DataFrame({"doc_id": np.asarray(ids, np.int64),
                             "n_tokens": np.asarray(ntok, np.int64),
                             "lz78": np.asarray(lz, np.int64)})

    return bucketed_groups(kept, ["doc_id"], _parse)


SQL_DOC_LZ78_COMPLEXITY = """
WITH RECURSIVE ws AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[0-9a-z_]+') AS w
  FROM documents WHERE doc_id % 10 = 0
),
parse AS (
  SELECT doc_id, w, 0 AS k, CAST([] AS VARCHAR[]) AS dict,
         '' AS cur, CAST(0 AS BIGINT) AS cnt
  FROM ws
  UNION ALL
  SELECT doc_id, w, k + 1,
         CASE WHEN list_contains(dict, cand) THEN dict
              ELSE list_append(dict, cand) END,
         CASE WHEN list_contains(dict, cand) THEN cand ELSE '' END,
         cnt + CASE WHEN list_contains(dict, cand) THEN 0 ELSE 1 END
  FROM (
    SELECT *, CASE WHEN cur = '' THEN w[k + 1]
                   ELSE cur || ' ' || w[k + 1] END AS cand
    FROM parse WHERE k < len(w)
  )
)
SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
       CAST(cnt + CASE WHEN cur <> '' THEN 1 ELSE 0 END AS BIGINT) AS lz78
FROM parse WHERE k = len(w)
"""


def q_tile_kcenter(sf_dir: str):  # exact oracle (mindist-list CTE)
    """GONZALEZ k-CENTER / FARTHEST-POINT SAMPLING over the depot tiles
    (every 50th, k = 8): start at the lowest id, repeatedly add the
    point FARTHEST from the chosen set (max min-dist², tie smallest id)
    — the 2-approximation for k-center AND the farthest-point-sampling
    primitive behind coreset selection and diverse data sampling (the
    spatial twin of kmeans++-style seeding). Emits one row per chosen
    center (step, tile_id, d2) where d2 is the coverage radius² the
    step was chosen at (step 1 → 0). Engine: dimension-sized vectorized
    walk maintaining the running min-dist array; oracle: the min-dist
    LIST updated through a recursive CTE with a composite argmax key."""
    t = td.tiles_table(sf_dir)
    tid = t["tile_id"].to_numpy().astype(np.int64)
    cx = t["cx"].to_numpy().astype(np.int64)
    cy = t["cy"].to_numpy().astype(np.int64)
    pm = tid % 50 == 0
    tid, cx, cy = tid[pm], cx[pm], cy[pm]
    order = np.argsort(tid)
    tid, cx, cy = tid[order], cx[order], cy[order]
    n = len(tid)
    k = min(8, n)
    cur = 0
    mind = (cx - cx[0]) ** 2 + (cy - cy[0]) ** 2
    steps = [1]
    centers = [int(tid[0])]
    dists = [0]
    for step in range(2, k + 1):
        # farthest point: max min-dist, tie smallest id -> maximize
        # (d2, -tid) == argmax of composite key d2*2^20 + (2^20-1-tid)
        key = mind * 1048576 + (1048575 - tid)
        nxt = int(np.argmax(key))
        steps.append(step)
        centers.append(int(tid[nxt]))
        dists.append(int(mind[nxt]))
        d2 = (cx - cx[nxt]) ** 2 + (cy - cy[nxt]) ** 2
        mind = np.minimum(mind, d2)
    return pd.DataFrame({"step": np.asarray(steps, np.int64),
                         "tile_id": np.asarray(centers, np.int64),
                         "d2": np.asarray(dists, np.int64)})


SQL_TILE_KCENTER = f"""WITH RECURSIVE tiles AS ({td.TILES_SQL}),
pn AS (SELECT tile_id, cx, cy FROM tiles WHERE tile_id % 50 = 0),
lst AS (
  SELECT list(tile_id ORDER BY tile_id) AS ids,
         list(cx ORDER BY tile_id) AS xs,
         list(cy ORDER BY tile_id) AS ys,
         CAST(LEAST(8, COUNT(*)) AS BIGINT) AS kk
  FROM pn
),
fps AS (
  SELECT ids, xs, ys, kk, 1 AS step, ids[1] AS center,
         CAST(0 AS BIGINT) AS d2,
         list_transform(range(1, len(ids) + 1),
           i -> (xs[i] - xs[1]) * (xs[i] - xs[1])
                + (ys[i] - ys[1]) * (ys[i] - ys[1])) AS mind
  FROM lst
  UNION ALL
  SELECT ids, xs, ys, kk, step + 1, ids[pos], mind[pos],
         list_transform(range(1, len(ids) + 1),
           i -> LEAST(mind[i],
                      (xs[i] - xs[pos]) * (xs[i] - xs[pos])
                      + (ys[i] - ys[pos]) * (ys[i] - ys[pos])))
  FROM (
    SELECT *, list_position(keys, list_aggregate(keys, 'max')) AS pos
    FROM (
      SELECT *, list_transform(range(1, len(ids) + 1),
               i -> mind[i] * 1048576 + (1048575 - ids[i])) AS keys
      FROM fps WHERE step < kk
    )
  )
)
SELECT CAST(step AS BIGINT) AS step, CAST(center AS BIGINT) AS tile_id,
       CAST(d2 AS BIGINT) AS d2
FROM fps
"""


def q_grid_life_rounds(sf_dir: str):  # exact oracle (unrolled 9-way joins)
    """CONWAY-LIFE cellular-automaton rounds over the probe-point
    OCCUPANCY raster (64×64, hard walls — no birth outside the world):
    survive on 2-3 neighbors, birth on exactly 3, three synchronous
    rounds — the NONLINEAR stencil next to the linear heat diffusion
    (`grid_heat_diffusion`): a threshold rule no convolution can
    express, the archetype of threshold cascades / epidemic spread on
    rasters. Emits (round, n_alive, chk) for rounds 0-3 with the
    Σ(31cx+17cy) position checksum. Engine: one raster combiner, then
    the grid-bounded rounds run as 8-shift numpy updates; oracle:
    per-round 8-neighbor fan-out counts + the rule as one CASE."""
    pts = conflation.read_points(sf_dir)
    from ..stages.relational import partial_groupby_sum

    def _cells_of(batch: pa.Table) -> pa.Table:
        x = batch["px"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch["py"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"cx": x // 1024, "cy": y // 1024})

    raw = pts.map_batches(_cells_of, batch_format="pyarrow", batch_size=8192)
    density = partial_groupby_sum(raw, ["cx", "cy"], [], count_as="v",
                                  est_rows=_nrows(sf_dir, "lineitem"))
    dtab = density.to_pandas()  # grid-bounded
    alive = np.zeros((64, 64), bool)
    alive[dtab["cy"].to_numpy(np.int64), dtab["cx"].to_numpy(np.int64)] = True
    rows = []
    for r in range(4):
        cy, cx = np.nonzero(alive)
        rows.append({"round": r, "n_alive": int(alive.sum()),
                     "chk": int((31 * cx + 17 * cy).sum())})
        if r == 3:
            break
        nb = np.zeros((64, 64), np.int64)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                sh = np.zeros((64, 64), np.int64)
                ys = slice(max(dy, 0), 64 + min(dy, 0))
                yd = slice(max(-dy, 0), 64 + min(-dy, 0))
                xs2 = slice(max(dx, 0), 64 + min(dx, 0))
                xd = slice(max(-dx, 0), 64 + min(-dx, 0))
                sh[ys, xs2] = alive[yd, xd]
                nb += sh
        alive = (alive & ((nb == 2) | (nb == 3))) | (~alive & (nb == 3))
    return pd.DataFrame(rows).astype(np.int64)


def _life_round_sql(r: int) -> str:
    return f""",
nb{r + 1} AS (
  SELECT a.cx + d.dx AS cx, a.cy + d.dy AS cy, COUNT(*) AS nb
  FROM a{r} a CROSS JOIN dirs d
  GROUP BY 1, 2
),
a{r + 1} AS (
  SELECT n.cx, n.cy
  FROM nb{r + 1} n
  LEFT JOIN a{r} o ON o.cx = n.cx AND o.cy = n.cy
  WHERE n.cx BETWEEN 0 AND 63 AND n.cy BETWEEN 0 AND 63
    AND CASE WHEN o.cx IS NOT NULL THEN n.nb IN (2, 3)
             ELSE n.nb = 3 END
)"""


SQL_GRID_LIFE_ROUNDS = _CTES + """,
a0 AS (SELECT DISTINCT px // 1024 AS cx, py // 1024 AS cy FROM points),
dirs(dx, dy) AS (VALUES (-1,-1),(0,-1),(1,-1),(-1,0),(1,0),(-1,1),(0,1),(1,1))
""" + "".join(_life_round_sql(r) for r in (0, 1, 2)) + """
SELECT 0 AS round, CAST(COUNT(*) AS BIGINT) AS n_alive,
       CAST(COALESCE(SUM(31 * cx + 17 * cy), 0) AS BIGINT) AS chk FROM a0
UNION ALL
SELECT 1, COUNT(*), CAST(COALESCE(SUM(31 * cx + 17 * cy), 0) AS BIGINT)
FROM a1
UNION ALL
SELECT 2, COUNT(*), CAST(COALESCE(SUM(31 * cx + 17 * cy), 0) AS BIGINT)
FROM a2
UNION ALL
SELECT 3, COUNT(*), CAST(COALESCE(SUM(31 * cx + 17 * cy), 0) AS BIGINT)
FROM a3
"""


def q_events_max_drawdown(sf_dir: str):  # exact oracle (cummax window)
    """MAXIMUM DRAWDOWN per event type over the (ts, event_id)-ordered
    cumulative signed value series (cents, sign by event parity:
    deposits/withdrawals) — the quant risk classic: the deepest
    peak-to-trough fall of the running balance, plus the µs instant the
    trough was FIRST reached. Vectorized: one cumsum + one cummax per
    group; oracle: stacked ROWS windows. Emits
    (event_type, max_drawdown, trough_ts)."""
    from ..stages.relational import bucketed_groups
    from ..functions.numeric import cents as _cents

    ev = _rp(sf_dir, "events", ["event_id", "event_type", "ts", "value"])

    def _pre(df: pd.DataFrame) -> pd.DataFrame:
        eid = df["event_id"].to_numpy(np.int64)
        vc = _cents(df["value"].to_numpy())
        sign = np.where(eid % 2 == 0, 1, -1)
        return pd.DataFrame({"event_type": df["event_type"].astype(str),
                             "event_id": eid,
                             "e": df["ts"].astype("int64").to_numpy(),
                             "dv": sign * vc})

    prep = ev.map_batches(_pre, batch_format="pandas", batch_size=8192)

    def _dd(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["event_type", "e", "event_id"], kind="mergesort")
        et = d["event_type"].to_numpy()
        e = d["e"].to_numpy(np.int64)
        dv = d["dv"].to_numpy(np.int64)
        n = len(d)
        new_g = np.ones(n, dtype=bool)
        new_g[1:] = et[1:] != et[:-1]
        starts = np.flatnonzero(new_g)
        rows = []
        for a, b in zip(starts, np.append(starts[1:], n)):
            bal = np.cumsum(dv[a:b])
            peak = np.maximum.accumulate(bal)
            dd = peak - bal
            mx = int(dd.max())
            ti = int(np.argmax(dd == mx))
            rows.append({"event_type": str(et[a]), "max_drawdown": mx,
                         "trough_ts": int(e[a + ti])})
        return pd.DataFrame(rows)

    return bucketed_groups(prep, ["event_type"], _dd)


SQL_EVENTS_MAX_DRAWDOWN = """
WITH b AS (
  SELECT event_type, event_id, CAST(epoch_us(ts) AS BIGINT) AS e,
         (CASE WHEN event_id % 2 = 0 THEN 1 ELSE -1 END)
           * CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS dv
  FROM events
),
s1 AS (
  SELECT event_type, event_id, e,
         SUM(dv) OVER w AS bal
  FROM b
  WINDOW w AS (PARTITION BY event_type ORDER BY e, event_id
               ROWS UNBOUNDED PRECEDING)
),
s2 AS (
  SELECT event_type, e,
         MAX(bal) OVER (PARTITION BY event_type ORDER BY e, event_id
                        ROWS UNBOUNDED PRECEDING) - bal AS dd
  FROM s1
),
mx AS (SELECT event_type, MAX(dd) AS max_drawdown FROM s2
       GROUP BY event_type)
SELECT s2.event_type, CAST(mx.max_drawdown AS BIGINT) AS max_drawdown,
       CAST(MIN(s2.e) AS BIGINT) AS trough_ts
FROM s2 JOIN mx ON mx.event_type = s2.event_type AND s2.dd = mx.max_drawdown
GROUP BY s2.event_type, mx.max_drawdown
"""


def q_doc_min_period(sf_dir: str):  # exact oracle (shifted-match scan)
    """SMALLEST PERIOD of each document's token stream (every 10th doc):
    min p ≥ 1 with w[i] = w[i+p] for every i ≤ n−p (p = n when nothing
    repeats) — the template/boilerplate detector of corpus curation (a
    page assembled from a repeating block has p ≪ n), the string-
    periodicity classic behind KMP borders. Engine: per-doc vectorized
    shifted-equality scan over candidate periods; oracle: a (doc, p, i)
    unnest with a NOT-EXISTS-style anti-aggregate, MIN over surviving p.
    Emits (doc_id, n_tokens, min_period)."""
    from ..functions.text import _WORD_ASCII_RE
    from ..stages.relational import bucketed_groups

    docs = _rp(sf_dir, "documents", ["doc_id", "text"])

    def _keep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(ids % 10 == 0))

    kept = docs.map_batches(_keep, batch_format="pyarrow", batch_size=8192)

    def _period(g: pd.DataFrame) -> pd.DataFrame:
        ids, ntok, per = [], [], []
        for did, text in zip(g["doc_id"].to_numpy(np.int64), g["text"]):
            ws = _WORD_ASCII_RE.findall((text or "").lower())
            n = len(ws)
            arr = np.array(ws, dtype=object)
            p = n if n else 0
            for cand in range(1, n):
                if (arr[:n - cand] == arr[cand:]).all():
                    p = cand
                    break
            ids.append(int(did))
            ntok.append(n)
            per.append(p)
        return pd.DataFrame({"doc_id": np.asarray(ids, np.int64),
                             "n_tokens": np.asarray(ntok, np.int64),
                             "min_period": np.asarray(per, np.int64)})

    return bucketed_groups(kept, ["doc_id"], _period)


SQL_DOC_MIN_PERIOD = """
WITH ws AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[0-9a-z_]+') AS w
  FROM documents WHERE doc_id % 10 = 0
),
cand AS (
  SELECT ws.doc_id, p.p,
         SUM(CASE WHEN w[i] <> w[i + p] THEN 1 ELSE 0 END) AS bad
  FROM ws,
       (SELECT unnest(range(1, 200)) AS p) p,
       (SELECT unnest(range(1, 200)) AS i) i
  WHERE p.p < len(w) AND i.i + p.p <= len(w)
  GROUP BY ws.doc_id, p.p
),
best AS (
  SELECT doc_id, MIN(p) AS mp FROM cand WHERE bad = 0 GROUP BY doc_id
)
SELECT ws.doc_id, CAST(len(ws.w) AS BIGINT) AS n_tokens,
       CAST(COALESCE(best.mp, len(ws.w)) AS BIGINT) AS min_period
FROM ws LEFT JOIN best ON best.doc_id = ws.doc_id
"""


def q_nation_region_transport(sf_dir: str):  # exact oracle (pointer CTE)
    """NORTHWEST-CORNER transportation-problem initialization: supplies =
    per-nation order counts (nation-id order), demands = per-region
    totals of member nations (region-id order, so the instance is
    balanced by construction); walk the matrix from the NW corner
    allocating min(supply left, demand left), advancing the exhausted
    side (both on a tie → diagonal step) — the classic starting basis
    every transportation-simplex implementation builds first. Emits one
    row per allocation (n_nationkey, r_regionkey, alloc). Engine: one
    combiner rollup + a (nations+regions)-step driver epilogue; oracle:
    an (i, j, remaining-supply, remaining-demand) pointer walked through
    a recursive CTE against supply/demand LISTs."""
    od = _rp(sf_dir, "orders", ["o_custkey"])
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_regionkey"])
    c2n = dict(zip(cust["c_custkey"].to_numpy().tolist(),
                   cust["c_nationkey"].to_numpy().tolist()))
    c2n_ref = ray.put(c2n)

    def _nk(batch: pa.Table) -> pa.Table:
        from ..stages.util import cached_state

        lookup = cached_state(c2n_ref, lambda d: d, token="transport.c2n")
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"nk": np.array([lookup[int(c)] for c in ck],
                                        np.int64)})

    counts = rel.partial_groupby_sum(
        od.map_batches(_nk, batch_format="pyarrow", batch_size=8192),
        ["nk"], [], count_as="s", est_rows=_nrows(sf_dir, "orders"))
    sup = counts.to_pandas().sort_values("nk")  # nations-bounded
    nks = sup["nk"].to_numpy(np.int64)
    ss = sup["s"].to_numpy(np.int64).copy()
    n2r = dict(zip(nat["n_nationkey"].to_numpy().tolist(),
                   nat["n_regionkey"].to_numpy().tolist()))
    rk_of = np.array([n2r[int(k)] for k in nks], np.int64)
    rks = np.unique(rk_of)
    dd = np.array([ss[rk_of == r].sum() for r in rks], np.int64)
    i = j = 0
    out_n, out_r, out_a = [], [], []
    while i < len(nks) and j < len(rks):
        a = int(min(ss[i], dd[j]))
        if a > 0:
            out_n.append(int(nks[i]))
            out_r.append(int(rks[j]))
            out_a.append(a)
        ss[i] -= a
        dd[j] -= a
        if ss[i] == 0:
            i += 1
        if dd[j] == 0:
            j += 1
    return pd.DataFrame({"n_nationkey": np.asarray(out_n, np.int64),
                         "r_regionkey": np.asarray(out_r, np.int64),
                         "alloc": np.asarray(out_a, np.int64)})


SQL_NATION_REGION_TRANSPORT = """
WITH RECURSIVE sup AS (
  SELECT c.c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS s
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1
),
dem AS (
  SELECT n.n_regionkey AS rk, CAST(SUM(sup.s) AS BIGINT) AS d
  FROM sup JOIN nation n ON n.n_nationkey = sup.nk
  GROUP BY 1
),
sl AS (
  SELECT list(nk ORDER BY nk) AS nks, list(s ORDER BY nk) AS ss FROM sup
),
dl AS (
  SELECT list(rk ORDER BY rk) AS rks, list(d ORDER BY rk) AS ds FROM dem
),
walk AS (
  SELECT nks, ss, rks, ds, 1 AS i, 1 AS j,
         ss[1] AS srem, ds[1] AS drem,
         CAST(NULL AS BIGINT) AS nk, CAST(NULL AS BIGINT) AS rk,
         CAST(NULL AS BIGINT) AS alloc
  FROM sl, dl
  UNION ALL
  SELECT nks, ss, rks, ds,
         CASE WHEN srem - a = 0 THEN i + 1 ELSE i END,
         CASE WHEN drem - a = 0 THEN j + 1 ELSE j END,
         CASE WHEN srem - a = 0
              THEN ss[i + 1] ELSE srem - a END,
         CASE WHEN drem - a = 0
              THEN ds[j + 1] ELSE drem - a END,
         nks[i], rks[j], a
  FROM (SELECT *, LEAST(srem, drem) AS a FROM walk
        WHERE i <= len(nks) AND j <= len(rks))
)
SELECT CAST(nk AS BIGINT) AS n_nationkey, CAST(rk AS BIGINT) AS r_regionkey,
       CAST(alloc AS BIGINT) AS alloc
FROM walk WHERE alloc IS NOT NULL AND alloc > 0
"""


def q_embedding_maxsim(sf_dir: str):  # exact oracle (slice-dot max/sum)
    """ColBERT-style LATE-INTERACTION retrieval (``ann.maxsim_topk``):
    every 64-dim vector splits into 8 contiguous sub-vectors ("token
    embeddings"); maxsim(q,d) = Σ_qt max_dt ⟨q_sub, d_sub⟩ in exact
    fixed-point integers — the modern multi-vector scorer between a
    single dot product and full cross-attention, the retrieval
    counterpart of `ann_topk`. Queries = vec_id < 4, corpus = every 10th
    vector, global top-3 per query (ties → smaller vec_id). Oracle:
    list-slice dot products (exact in doubles below 2⁵³) with a
    MAX-per-(q,d,qt) + SUM + ROW_NUMBER pipeline."""
    emb = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])

    def _docs(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(ids % 10 == 0))

    docs = emb.map_batches(_docs, batch_format="pyarrow", batch_size=4096)
    qtab = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    keep = qtab["vec_id"].to_numpy() < 4
    queries_ref = ray.put(qtab.filter(pa.array(keep)))
    return ann.maxsim_topk(docs, queries_ref, k=3, n_sub=8)


SQL_EMBEDDING_MAXSIM = f"""
WITH e AS ({{emb}}),
d AS (SELECT vec_id, qv FROM e WHERE vec_id % 10 = 0),
q AS (SELECT vec_id AS query_id, qv AS quv FROM e WHERE vec_id < 4),
sd AS (
  SELECT q.query_id, d.vec_id, t.t,
         MAX(CAST(list_dot_product(
           list_transform(q.quv[t.t * 8 + 1 : t.t * 8 + 8],
                          x -> CAST(x AS DOUBLE)),
           list_transform(d.qv[u.u * 8 + 1 : u.u * 8 + 8],
                          x -> CAST(x AS DOUBLE))) AS BIGINT)) AS best
  FROM q CROSS JOIN d
  CROSS JOIN (SELECT unnest(range(0, 8)) AS t) t
  CROSS JOIN (SELECT unnest(range(0, 8)) AS u) u
  WHERE d.vec_id <> q.query_id
  GROUP BY 1, 2, 3
),
ms AS (SELECT query_id, vec_id, SUM(best) AS maxsim FROM sd GROUP BY 1, 2)
SELECT query_id, vec_id, ms_rank, CAST(maxsim AS BIGINT) AS maxsim FROM (
  SELECT query_id, vec_id, maxsim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY maxsim DESC, vec_id) AS ms_rank
  FROM ms
) WHERE ms_rank <= 3
""".format(emb=_SQL_EMB_FIXED.format(src="embeddings"))


def q_embedding_mmr_rerank(sf_dir: str):  # exact oracle (unrolled rounds)
    """MAXIMAL MARGINAL RELEVANCE rerank — the retrieve-then-rerank shape
    of every RAG / search stack: retrieve the top-50 candidates by exact
    fixed-point dot product against query vector 0 (distributed matmul +
    k×B-bounded top-k merge), then greedily select 5 balancing relevance
    against redundancy, score2(d) = 2·rel(d) − max_{s∈S}⟨d, s⟩ (λ = ½ in
    integers; ties → smaller vec_id) — the diversity-aware selection that
    plain top-k cannot express (MMR is FPS with a relevance prior; cf.
    `tile_kcenter`). Emits (step, vec_id, score2), step 1 = 2·rel.
    Engine: rerank runs on the candidate-bounded set — the operator's
    real-world contract; oracle: five unrolled argmax rounds over the
    same top-50 CTE."""
    emb = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    qtab = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    qv = ann.quantize_fixed(
        np.stack(qtab.filter(pa.array(qtab["vec_id"].to_numpy() == 0))
                 ["embedding"].to_pylist()).astype(np.float64))[0]
    qv_ref = ray.put(qv)

    def _rel(batch: pa.Table) -> pa.Table:
        from ..stages.util import cached_state

        q = cached_state(qv_ref, lambda v: v, token="mmr.query")
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ids % 10 == 0
        ids = ids[keep]
        if not len(ids):
            return pa.table({"vec_id": np.array([], np.int64),
                             "rel": np.array([], np.int64)})
        x = ann.quantize_fixed(ann._batch_matrix(
            batch.filter(pa.array(keep)), "embedding"))
        return pa.table({"vec_id": ids, "rel": x @ q})

    rels = emb.map_batches(_rel, batch_format="pyarrow", batch_size=4096)

    def _addg(batch: pa.Table) -> pa.Table:
        return batch.append_column("g", pa.array(np.zeros(batch.num_rows,
                                                          np.int64)))

    keyed = rels.map_batches(_addg, batch_format="pyarrow", batch_size=8192)
    top = rel.group_topk(keyed, ["g"], [("rel", False), ("vec_id", True)], 50)
    cand = top.to_pandas()  # candidate-bounded (<= 50 rows)
    cids = cand["vec_id"].to_numpy(np.int64)
    crel = cand["rel"].to_numpy(np.int64)
    lookup = {int(v): i for i, v in
              enumerate(qtab["vec_id"].to_numpy().tolist())}
    mat = ann.quantize_fixed(
        np.stack(qtab["embedding"].to_pylist()).astype(np.float64))
    cvec = mat[[lookup[int(v)] for v in cids]]
    maxsim = np.full(len(cids), np.iinfo(np.int64).min // 2, np.int64)
    chosen = np.zeros(len(cids), bool)
    steps, sel_ids, scores = [], [], []
    for step in range(1, min(5, len(cids)) + 1):
        if step == 1:
            sc = 2 * crel
        else:
            sc = 2 * crel - maxsim
        idx = np.flatnonzero(~chosen)
        order = np.lexsort((cids[idx], -sc[idx]))
        pick = int(idx[order[0]])
        steps.append(step)
        sel_ids.append(int(cids[pick]))
        scores.append(int(sc[pick]))
        chosen[pick] = True
        sims = cvec @ cvec[pick]
        maxsim = np.maximum(maxsim, sims) if step > 1 else sims
    return pd.DataFrame({"step": np.asarray(steps, np.int64),
                         "vec_id": np.asarray(sel_ids, np.int64),
                         "score2": np.asarray(scores, np.int64)})


def _mmr_round_sql(r: int) -> str:
    prev = ", ".join(f"s{i}" for i in range(1, r))
    dots = ", ".join(
        "CAST(list_dot_product("
        "list_transform(c.qv, x -> CAST(x AS DOUBLE)), "
        f"list_transform(s{i}.qv, x -> CAST(x AS DOUBLE))) AS BIGINT)"
        for i in range(1, r))
    excl = ", ".join(f"s{i}.vec_id" for i in range(1, r))
    return f""",
m{r} AS (
  SELECT c.vec_id, c.rel, c.qv, GREATEST({dots}) AS maxsim
  FROM cand c, {prev}
  WHERE c.vec_id NOT IN ({excl})
),
s{r} AS (
  SELECT vec_id, rel, qv, 2 * rel - maxsim AS score2
  FROM m{r} ORDER BY 2 * rel - maxsim DESC, vec_id LIMIT 1
)"""


SQL_EMBEDDING_MMR_RERANK = ("""
WITH e AS ({emb}),
q AS (SELECT qv AS quv FROM e WHERE vec_id = 0),
rels AS (
  SELECT e.vec_id, e.qv,
         CAST(list_dot_product(
           list_transform(e.qv, x -> CAST(x AS DOUBLE)),
           list_transform(q.quv, x -> CAST(x AS DOUBLE))) AS BIGINT) AS rel
  FROM e, q WHERE e.vec_id % 10 = 0
),
cand AS (SELECT * FROM rels ORDER BY rel DESC, vec_id LIMIT 50),
s1 AS (SELECT vec_id, rel, qv, 2 * rel AS score2
       FROM cand ORDER BY rel DESC, vec_id LIMIT 1)"""
    + "".join(_mmr_round_sql(r) for r in (2, 3, 4, 5)) + """
SELECT 1 AS step, vec_id, CAST(score2 AS BIGINT) AS score2 FROM s1
UNION ALL SELECT 2, vec_id, CAST(score2 AS BIGINT) FROM s2
UNION ALL SELECT 3, vec_id, CAST(score2 AS BIGINT) FROM s3
UNION ALL SELECT 4, vec_id, CAST(score2 AS BIGINT) FROM s4
UNION ALL SELECT 5, vec_id, CAST(score2 AS BIGINT) FROM s5
""").format(emb=_SQL_EMB_FIXED.format(src="embeddings"))


def q_embedding_rrf_fusion(sf_dir: str):  # exact oracle (dual-rank RRF)
    """RECIPROCAL RANK FUSION of two exact rankers — the standard hybrid-
    search combiner (BM25 × dense, here DOT-PRODUCT × L2², which rank
    genuinely differently because vector norms vary): integer RRF score
    = 720720//(60+r_dot) + 720720//(60+r_l2) (720720 = lcm(1..16) keeps
    the floor divides informative; the floor-integer form IS the
    definition so both sides are exact). Queries vec_id < 4, corpus
    every 10th vector; emits fused top-5 (ties → smaller vec_id).
    Engine: one distributed pass computes both scores; the per-query
    full ranking runs on the (4 × corpus)-bounded epilogue. Oracle: two
    ROW_NUMBER rankings + the same floor score."""
    emb = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    qtab = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    keep = qtab["vec_id"].to_numpy() < 4
    qq = qtab.filter(pa.array(keep))
    q_ref = ray.put(qq)

    def _scores(batch: pa.Table) -> pa.Table:
        from ..stages.util import cached_state

        class _St:
            def __init__(self, q):
                self.qid = q["vec_id"].to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                self.qm = ann.quantize_fixed(
                    ann._batch_matrix(q, "embedding"))

        st = cached_state(q_ref, _St, token="rrf._St")
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = ids % 10 == 0
        ids = ids[m]
        if not len(ids):
            return pa.table({"query_id": np.array([], np.int64),
                             "vec_id": np.array([], np.int64),
                             "dot": np.array([], np.int64),
                             "l2": np.array([], np.int64)})
        x = ann.quantize_fixed(ann._batch_matrix(batch.filter(pa.array(m)),
                                                 "embedding"))
        dots = st.qm @ x.T  # (Q, B)
        qn = (st.qm * st.qm).sum(axis=1)[:, None]
        xn = (x * x).sum(axis=1)[None, :]
        l2 = qn + xn - 2 * dots
        qi = np.repeat(st.qid, len(ids))
        di = np.tile(ids, len(st.qid))
        ok = qi != di
        return pa.table({"query_id": qi[ok], "vec_id": di[ok],
                         "dot": dots.reshape(-1)[ok],
                         "l2": l2.reshape(-1)[ok]})

    sc = emb.map_batches(_scores, batch_format="pyarrow",
                         batch_size=4096).to_pandas()
    # per-query full ranking on the (queries x corpus)-bounded table
    out_rows = []
    for qid, g in sc.groupby("query_id"):
        g = g.reset_index(drop=True)
        vid = g["vec_id"].to_numpy(np.int64)
        dot = g["dot"].to_numpy(np.int64)
        l2 = g["l2"].to_numpy(np.int64)
        n = len(g)
        r_dot = np.empty(n, np.int64)
        r_dot[np.lexsort((vid, -dot))] = np.arange(1, n + 1)
        r_l2 = np.empty(n, np.int64)
        r_l2[np.lexsort((vid, l2))] = np.arange(1, n + 1)
        score = 720720 // (60 + r_dot) + 720720 // (60 + r_l2)
        top = np.lexsort((vid, -score))[:5]
        for rank, i in enumerate(top, start=1):
            out_rows.append({"query_id": int(qid), "vec_id": int(vid[i]),
                             "fused_rank": rank, "score": int(score[i])})
    return pd.DataFrame(out_rows)


SQL_EMBEDDING_RRF_FUSION = """
WITH e AS ({emb}),
d AS (SELECT vec_id, qv FROM e WHERE vec_id % 10 = 0),
q AS (SELECT vec_id AS query_id, qv AS quv FROM e WHERE vec_id < 4),
sc AS (
  SELECT q.query_id, d.vec_id,
         CAST(list_dot_product(
           list_transform(q.quv, x -> CAST(x AS DOUBLE)),
           list_transform(d.qv, x -> CAST(x AS DOUBLE))) AS BIGINT) AS dot,
         CAST(list_dot_product(
           list_transform(q.quv, x -> CAST(x AS DOUBLE)),
           list_transform(q.quv, x -> CAST(x AS DOUBLE)))
           + list_dot_product(
           list_transform(d.qv, x -> CAST(x AS DOUBLE)),
           list_transform(d.qv, x -> CAST(x AS DOUBLE)))
           - 2 * list_dot_product(
           list_transform(q.quv, x -> CAST(x AS DOUBLE)),
           list_transform(d.qv, x -> CAST(x AS DOUBLE))) AS BIGINT) AS l2
  FROM q CROSS JOIN d WHERE d.vec_id <> q.query_id
),
rk AS (
  SELECT query_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY dot DESC, vec_id) AS r_dot,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY l2, vec_id) AS r_l2
  FROM sc
),
fused AS (
  SELECT query_id, vec_id,
         720720 // (60 + r_dot) + 720720 // (60 + r_l2) AS score
  FROM rk
)
SELECT query_id, vec_id, fused_rank, CAST(score AS BIGINT) AS score FROM (
  SELECT query_id, vec_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, vec_id) AS fused_rank
  FROM fused
) WHERE fused_rank <= 5
""".format(emb=_SQL_EMB_FIXED.format(src="embeddings"))


def q_grid_boxcount(sf_dir: str):  # exact oracle (multi-level rollup)
    """FRACTAL BOX-COUNTING pieces of the probe-point set: occupied-box
    counts at cell sizes 512/1024/2048/4096 — the log-log slope of
    N(s) vs 1/s is the box-counting dimension, THE spatial-complexity
    measure separating space-filling point fields from curve-like or
    clustered ones (emitted as exact counts; the fit is the caller's
    one-liner). One combiner per level over the same derived cells —
    four value-domain-bounded shuffles, no materialization of points."""
    pts = conflation.read_points(sf_dir)
    from ..stages.relational import partial_groupby_sum

    rows = []
    for cell in (512, 1024, 2048, 4096):
        def _cells_of(batch: pa.Table, c=cell) -> pa.Table:
            x = batch["px"].to_numpy(zero_copy_only=False).astype(np.int64)
            y = batch["py"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"cx": x // c, "cy": y // c})

        raw = pts.map_batches(_cells_of, batch_format="pyarrow",
                              batch_size=8192)
        density = partial_groupby_sum(raw, ["cx", "cy"], [], count_as="v",
                                      est_rows=_nrows(sf_dir, "lineitem"))
        rows.append({"cell": cell, "n_boxes": density.count()})
    return pd.DataFrame(rows).astype(np.int64)


SQL_GRID_BOXCOUNT = _CTES + """
SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_boxes FROM (
  SELECT s.cell, px // s.cell AS cx, py // s.cell AS cy
  FROM points CROSS JOIN (SELECT unnest([512, 1024, 2048, 4096]) AS cell) s
  GROUP BY 1, 2, 3
) GROUP BY cell
"""


def q_doc_cdc_chunks(sf_dir: str):  # exact oracle (candidate-list CTE)
    """CONTENT-DEFINED CHUNKING per document (the FastCDC/rsync family —
    THE dedup-storage primitive, and the shift-robust chunker for RAG
    pipelines: an insertion only reshuffles nearby cut points, unlike
    fixed-width chunking): a width-4 polynomial rolling hash over the
    ASCII bytes marks candidate cuts where H(i) % 64 == 0; walk
    left-to-right cutting at the first candidate in [cur+16, cur+64],
    else forcing a cut at cur+64 (end-clamped). Emits (doc_id, n_chunks,
    len2_sum) with Σ len² pinning the exact cut layout. Engine: hash
    candidates vectorized, per-doc O(chunks) walk; oracle: the candidate
    POSITION LIST walked through a recursive CTE with list_filter."""
    from ..stages.relational import bucketed_groups

    docs = _rp(sf_dir, "documents", ["doc_id", "text"])

    def _chunk(g: pd.DataFrame) -> pd.DataFrame:
        ids, nch, l2s = [], [], []
        for did, text in zip(g["doc_id"].to_numpy(np.int64), g["text"]):
            b = np.frombuffer((text or "").encode("ascii", "replace"),
                              dtype=np.uint8).astype(np.int64)
            n = len(b)
            if n >= 4:
                h = b[3:] + 31 * b[2:-1] + 961 * b[1:-2] + 29791 * b[:-3]
                cand = np.flatnonzero(h % 64 == 0) + 4  # 1-based hash pos
            else:
                cand = np.array([], np.int64)
            cur, cnt, l2 = 0, 0, 0
            while cur < n:
                end = min(cur + 64, n)
                nxt = cand[(cand >= cur + 16) & (cand <= end)]
                cut = int(nxt[0]) if len(nxt) else end
                cnt += 1
                l2 += (cut - cur) ** 2
                cur = cut
            ids.append(int(did))
            nch.append(cnt)
            l2s.append(l2)
        return pd.DataFrame({"doc_id": np.asarray(ids, np.int64),
                             "n_chunks": np.asarray(nch, np.int64),
                             "len2_sum": np.asarray(l2s, np.int64)})

    return bucketed_groups(docs, ["doc_id"], _chunk)


SQL_DOC_CDC_CHUNKS = """
WITH RECURSIVE d AS (
  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n FROM documents
),
cand AS (
  SELECT d.doc_id,
         list(i ORDER BY i) FILTER (
           (ord(substr(text, i, 1))
            + 31 * ord(substr(text, i - 1, 1))
            + 961 * ord(substr(text, i - 2, 1))
            + 29791 * ord(substr(text, i - 3, 1))) % 64 = 0) AS pos
  FROM d, (SELECT unnest(range(4, 600)) AS i) ii
  WHERE i <= n
  GROUP BY d.doc_id
),
walk AS (
  SELECT d.doc_id, d.n, COALESCE(c.pos, []) AS pos,
         CAST(0 AS BIGINT) AS cur, CAST(0 AS BIGINT) AS cnt,
         CAST(0 AS BIGINT) AS l2
  FROM d LEFT JOIN cand c ON c.doc_id = d.doc_id
  UNION ALL
  SELECT doc_id, n, pos, cut, cnt + 1, l2 + (cut - cur) * (cut - cur)
  FROM (
    SELECT *, COALESCE(
        list_filter(pos, i -> i >= cur + 16
                          AND i <= LEAST(cur + 64, n))[1],
        LEAST(cur + 64, n)) AS cut
    FROM walk WHERE cur < n
  )
)
SELECT doc_id, CAST(cnt AS BIGINT) AS n_chunks, CAST(l2 AS BIGINT) AS len2_sum
FROM walk WHERE cur >= n
"""


def q_tile_dominating_set(sf_dir: str):  # exact oracle (coverage-list CTE)
    """GREEDY DOMINATING SET over the depot kNN graph (every 50th tile,
    symmetric 2-NN edges): repeatedly pick the node whose CLOSED
    neighborhood covers the most still-uncovered nodes (ties → smaller
    id) until everything is covered — the ln(n)-approximation set-cover
    greedy, i.e. the facility-placement dual of `tile_kcenter` (cover
    with neighborhoods instead of radii). Emits (step, tile_id, gain).
    Engine: dimension-sized vectorized walk over a boolean coverage
    array; oracle: adjacency LISTS-of-lists + a covered list through a
    recursive CTE (per-round gains via list_filter/list_contains)."""
    t = td.tiles_table(sf_dir)
    tid = t["tile_id"].to_numpy().astype(np.int64)
    cx = t["cx"].to_numpy().astype(np.int64)
    cy = t["cy"].to_numpy().astype(np.int64)
    pm = tid % 50 == 0
    tid, cx, cy = tid[pm], cx[pm], cy[pm]
    order = np.argsort(tid)
    tid, cx, cy = tid[order], cx[order], cy[order]
    n = len(tid)
    # symmetric 2-NN adjacency (dist², tie smaller id), closed
    nbr = [set([i]) for i in range(n)]
    for i in range(n):
        d2 = (cx - cx[i]) ** 2 + (cy - cy[i]) ** 2
        cand = np.lexsort((tid, d2))
        cnt = 0
        for j in cand:
            if j == i:
                continue
            nbr[i].add(int(j))
            nbr[int(j)].add(i)
            cnt += 1
            if cnt == 2:
                break
    covered = np.zeros(n, bool)
    steps, picks, gains = [], [], []
    step = 0
    while not covered.all():
        step += 1
        gain = np.array([np.count_nonzero(~covered[list(s)]) for s in nbr],
                        np.int64)
        idx = np.flatnonzero(gain == gain.max())
        pick = int(idx[np.argmin(tid[idx])])
        steps.append(step)
        picks.append(int(tid[pick]))
        gains.append(int(gain[pick]))
        covered[list(nbr[pick])] = True
    return pd.DataFrame({"step": np.asarray(steps, np.int64),
                         "tile_id": np.asarray(picks, np.int64),
                         "gain": np.asarray(gains, np.int64)})


SQL_TILE_DOMINATING_SET = f"""WITH RECURSIVE tiles AS ({td.TILES_SQL}),
pn AS (SELECT tile_id, cx, cy FROM tiles WHERE tile_id % 50 = 0),
pk AS (
  SELECT s, t FROM (
    SELECT a.tile_id AS s, b.tile_id AS t,
           ROW_NUMBER() OVER (
             PARTITION BY a.tile_id
             ORDER BY (a.cx - b.cx) * (a.cx - b.cx)
                    + (a.cy - b.cy) * (a.cy - b.cy), b.tile_id) AS rn
    FROM pn a JOIN pn b ON b.tile_id <> a.tile_id
  ) WHERE rn <= 2
),
ed AS (
  SELECT s, t FROM pk
  UNION
  SELECT t, s FROM pk
  UNION
  SELECT tile_id, tile_id FROM pn
),
adjl AS (
  SELECT s, list(t ORDER BY t) AS nbrs FROM ed GROUP BY s
),
base AS (
  SELECT list(s ORDER BY s) AS ids,
         list(nbrs ORDER BY s) AS adj,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM adjl
),
greedy AS (
  SELECT ids, adj, n, 0 AS step, CAST(NULL AS BIGINT) AS center,
         CAST(NULL AS BIGINT) AS gain, CAST([] AS BIGINT[]) AS cov
  FROM base
  UNION ALL
  SELECT ids, adj, n, step + 1, ids[pos], gains[pos],
         list_sort(list_distinct(list_concat(cov, adj[pos])))
  FROM (
    SELECT *, list_position(keys, list_aggregate(keys, 'max')) AS pos
    FROM (
      SELECT *, list_transform(range(1, len(ids) + 1),
                 v -> len(list_filter(adj[v],
                          u -> NOT list_contains(cov, u)))) AS gains,
             list_transform(range(1, len(ids) + 1),
                 v -> len(list_filter(adj[v],
                          u -> NOT list_contains(cov, u))) * 1048576
                      + (1048575 - ids[v])) AS keys
      FROM greedy WHERE len(cov) < n
    )
  )
)
SELECT CAST(step AS BIGINT) AS step, CAST(center AS BIGINT) AS tile_id,
       CAST(gain AS BIGINT) AS gain
FROM greedy WHERE step > 0
"""


def q_embedding_isotonic(sf_dir: str):  # exact oracle (stack-machine CTE)
    """ISOTONIC REGRESSION by POOL-ADJACENT-VIOLATORS — the calibration
    classic (monotone fit of label vs retrieval score, the exact
    algorithm behind isotonic probability calibration): points are every
    20th vector ordered by (dot-score to query 0 asc, vec_id), y = its
    integer label; adjacent blocks merge while mean_left ≥ mean_right,
    tested EXACTLY by cross-multiplication (sum_l·n_r ≥ sum_r·n_l).
    Emits one row per final block (blk, n_pts, y_sum) — the fitted step
    function as exact rationals y_sum/n_pts. Engine: one distributed
    scoring pass + the point-bounded stack epilogue; oracle: the PAV
    stack simulated one push-or-merge per round in a recursive CTE (the
    `shape_hull` stack-machine device)."""
    emb = _rp(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    qtab = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    qv = ann.quantize_fixed(
        np.stack(qtab.filter(pa.array(qtab["vec_id"].to_numpy() == 0))
                 ["embedding"].to_pylist()).astype(np.float64))[0]
    qv_ref = ray.put(qv)

    def _score(batch: pa.Table) -> pa.Table:
        from ..stages.util import cached_state

        q = cached_state(qv_ref, lambda v: v, token="iso.query")
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ids % 20 == 0
        ids = ids[keep]
        if not len(ids):
            return pa.table({"vec_id": np.array([], np.int64),
                             "x": np.array([], np.int64),
                             "y": np.array([], np.int64)})
        sub = batch.filter(pa.array(keep))
        x = ann.quantize_fixed(ann._batch_matrix(sub, "embedding")) @ q
        y = sub["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"vec_id": ids, "x": x, "y": y})

    pts = emb.map_batches(_score, batch_format="pyarrow",
                          batch_size=4096).to_pandas()
    d = pts.sort_values(["x", "vec_id"], kind="mergesort")
    ys = d["y"].to_numpy(np.int64)
    ns: list[int] = []
    ss: list[int] = []
    for y in ys:
        ns.append(1)
        ss.append(int(y))
        while len(ns) >= 2 and ss[-2] * ns[-1] >= ss[-1] * ns[-2]:
            ns[-2] += ns[-1]
            ss[-2] += ss[-1]
            ns.pop()
            ss.pop()
    return pd.DataFrame({"blk": np.arange(1, len(ns) + 1, dtype=np.int64),
                         "n_pts": np.asarray(ns, np.int64),
                         "y_sum": np.asarray(ss, np.int64)})


SQL_EMBEDDING_ISOTONIC = """
WITH RECURSIVE e AS ({emb}),
q AS (SELECT qv AS quv FROM e WHERE vec_id = 0),
pts AS (
  SELECT e.vec_id,
         CAST(list_dot_product(
           list_transform(e.qv, x -> CAST(x AS DOUBLE)),
           list_transform(q.quv, x -> CAST(x AS DOUBLE))) AS BIGINT) AS x
  FROM e, q WHERE e.vec_id % 20 = 0
),
lb AS (
  SELECT p.vec_id, p.x, CAST(emb2.label AS BIGINT) AS y
  FROM pts p JOIN embeddings emb2 ON emb2.vec_id = p.vec_id
),
lst AS (
  SELECT list(y ORDER BY x, vec_id) AS ysl, CAST(COUNT(*) AS BIGINT) AS n
  FROM lb
),
pav AS (
  SELECT ysl, n, 0 AS k,
         CAST([] AS BIGINT[]) AS ns, CAST([] AS BIGINT[]) AS ss
  FROM lst
  UNION ALL
  SELECT ysl, n,
         CASE WHEN can_merge THEN k ELSE k + 1 END,
         CASE WHEN can_merge
              THEN list_append(ns[1:len(ns) - 2],
                               ns[len(ns) - 1] + ns[len(ns)])
              ELSE list_append(ns, 1) END,
         CASE WHEN can_merge
              THEN list_append(ss[1:len(ss) - 2],
                               ss[len(ss) - 1] + ss[len(ss)])
              ELSE list_append(ss, ysl[k + 1]) END
  FROM (
    SELECT *, len(ns) >= 2
              AND ss[len(ss) - 1] * ns[len(ns)]
                  >= ss[len(ss)] * ns[len(ns) - 1] AS can_merge
    FROM pav WHERE k < n OR (len(ns) >= 2
              AND ss[len(ss) - 1] * ns[len(ns)]
                  >= ss[len(ss)] * ns[len(ns) - 1])
  )
)
SELECT CAST(i AS BIGINT) AS blk, CAST(ns[i] AS BIGINT) AS n_pts,
       CAST(ss[i] AS BIGINT) AS y_sum
FROM (
  SELECT ns, ss FROM pav
  WHERE k = n AND NOT (len(ns) >= 2
        AND ss[len(ss) - 1] * ns[len(ns)] >= ss[len(ss)] * ns[len(ns) - 1])
), (SELECT unnest(range(1, 10000)) AS i) ii
WHERE i <= len(ns)
""".format(emb=_SQL_EMB_FIXED.format(src="embeddings"))


def q_traj_alpha_beta(sf_dir: str):  # exact oracle (state-replay CTE)
    """α-β TRACKING FILTER per user trajectory (the fixed-gain Kalman
    predecessor every radar/GPS tracker starts from): state (x, v) in
    ×256 fixed point over the (ts, event_id)-ordered x-coordinates;
    predict xp = x + v, residual r = 256·z − xp, correct x += r/4,
    v += r/16 with TRUNCATING division (the SQL ``//`` semantics,
    deliberately — numpy floors, so the engine truncates explicitly;
    same device as `embedding_power_iteration`). Emits per user
    (n, x_fin, v_fin, innov_l1) — the L1 innovation sum is the filter-
    health metric. Engine: one bucketed shuffle + per-user scan; oracle:
    the z LIST replayed one step per recursive round."""
    from ..stages.relational import bucketed_groups

    ev = _rp(sf_dir, "events", ["event_id", "user_id", "ts"])

    def _pts(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"user_id": uid, "event_id": eid,
                         "e": batch["ts"].cast(pa.int64()),
                         "z": (eid * 48271 + uid * 977) % 65536})

    pts = ev.map_batches(_pts, batch_format="pyarrow", batch_size=8192)

    def _tdiv(a: int, b: int) -> int:
        return -((-a) // b) if a < 0 else a // b

    def _track(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["user_id", "e", "event_id"], kind="mergesort")
        uid = d["user_id"].to_numpy(np.int64)
        z = d["z"].to_numpy(np.int64)
        n = len(d)
        new_u = np.ones(n, dtype=bool)
        new_u[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(new_u)
        rows = []
        for a, b in zip(starts, np.append(starts[1:], n)):
            x = int(z[a]) * 256
            v = 0
            innov = 0
            for i in range(a + 1, b):
                xp = x + v
                r = int(z[i]) * 256 - xp
                x = xp + _tdiv(r, 4)
                v = v + _tdiv(r, 16)
                innov += abs(r)
            rows.append({"user_id": int(uid[a]), "n": b - a,
                         "x_fin": x, "v_fin": v, "innov_l1": innov})
        return pd.DataFrame(rows)

    return bucketed_groups(pts, ["user_id"], _track)


SQL_TRAJ_ALPHA_BETA = """
WITH RECURSIVE pts AS (
  SELECT user_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gi,
         CAST((event_id * 48271 + user_id * 977) % 65536 AS BIGINT) AS z
  FROM events
),
lst AS (
  SELECT user_id, list(z ORDER BY gi) AS zs, CAST(COUNT(*) AS BIGINT) AS n
  FROM pts GROUP BY user_id
),
track AS (
  SELECT user_id, zs, n, 1 AS k,
         zs[1] * 256 AS x, CAST(0 AS BIGINT) AS v,
         CAST(0 AS BIGINT) AS innov
  FROM lst
  UNION ALL
  SELECT user_id, zs, n, k + 1,
         (x + v) + (zs[k + 1] * 256 - (x + v)) // 4,
         v + (zs[k + 1] * 256 - (x + v)) // 16,
         innov + ABS(zs[k + 1] * 256 - (x + v))
  FROM track WHERE k < n
)
SELECT user_id, n, CAST(x AS BIGINT) AS x_fin, CAST(v AS BIGINT) AS v_fin,
       CAST(innov AS BIGINT) AS innov_l1
FROM track WHERE k = n
"""


def q_part_ss_policy(sf_dir: str):  # exact oracle (inventory-replay CTE)
    """(s, S) INVENTORY POLICY REPLAY per part — the inventory-control
    classic: demands are the part's lineitem quantities in (shipdate,
    orderkey, linenumber) order; stock starts at S = 150; each demand
    consumes stock with LOST SALES when short (lost += q − I, I = 0),
    then reorders up to S whenever I < s = 50. Emits (l_partkey,
    n_demands, n_reorders, lost_units, i_final) — the
    service-level-vs-holding trade every replenishment planner
    simulates. Engine: one bucketed shuffle + per-part scan; oracle: the
    demand LIST replayed one step per recursive round."""
    from ..stages.relational import bucketed_groups

    li = _rp(sf_dir, "lineitem", ["l_partkey", "l_orderkey", "l_linenumber",
                                  "l_shipdate", "l_quantity"])

    def _prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": batch["l_partkey"].cast(pa.int64()),
            "sd": batch["l_shipdate"].cast(pa.int64()),
            "okey": batch["l_orderkey"].cast(pa.int64()),
            "lnum": batch["l_linenumber"].cast(pa.int64()),
            "q": cents(batch["l_quantity"].to_numpy(zero_copy_only=False),
                       1)})

    prep = li.map_batches(_prep, batch_format="pyarrow", batch_size=8192)
    BIG_S, LIT_S = 150, 50

    def _replay(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["l_partkey", "sd", "okey", "lnum"],
                          kind="mergesort")
        pk = d["l_partkey"].to_numpy(np.int64)
        q = d["q"].to_numpy(np.int64)
        n = len(d)
        new_g = np.ones(n, dtype=bool)
        new_g[1:] = pk[1:] != pk[:-1]
        starts = np.flatnonzero(new_g)
        rows = []
        for a, b in zip(starts, np.append(starts[1:], n)):
            inv, reorders, lost = BIG_S, 0, 0
            for i in range(a, b):
                qq = int(q[i])
                if qq > inv:
                    lost += qq - inv
                    inv = 0
                else:
                    inv -= qq
                if inv < LIT_S:
                    inv = BIG_S
                    reorders += 1
            rows.append({"l_partkey": int(pk[a]), "n_demands": b - a,
                         "n_reorders": reorders, "lost_units": lost,
                         "i_final": inv})
        return pd.DataFrame(rows)

    return bucketed_groups(prep, ["l_partkey"], _replay)


SQL_PART_SS_POLICY = """
WITH RECURSIVE dm AS (
  SELECT l_partkey, CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS q,
         l_shipdate, l_orderkey, l_linenumber
  FROM lineitem
),
lst AS (
  SELECT l_partkey,
         list(q ORDER BY l_shipdate, l_orderkey, l_linenumber) AS qs,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM dm GROUP BY l_partkey
),
rp AS (
  SELECT l_partkey, qs, n, 0 AS k, CAST(150 AS BIGINT) AS inv,
         CAST(0 AS BIGINT) AS reorders, CAST(0 AS BIGINT) AS lost
  FROM lst
  UNION ALL
  SELECT l_partkey, qs, n, k + 1,
         CASE WHEN after_sale < 50 THEN 150 ELSE after_sale END,
         reorders + CASE WHEN after_sale < 50 THEN 1 ELSE 0 END,
         lost + GREATEST(qs[k + 1] - inv, 0)
  FROM (
    SELECT *, GREATEST(inv - qs[k + 1], 0) AS after_sale
    FROM rp WHERE k < n
  )
)
SELECT l_partkey, n AS n_demands, CAST(reorders AS BIGINT) AS n_reorders,
       CAST(lost AS BIGINT) AS lost_units, CAST(inv AS BIGINT) AS i_final
FROM rp WHERE k = n
"""


def q_events_peak_prominence(sf_dir: str):  # exact oracle (day² joins)
    """PEAK DETECTION WITH TOPOGRAPHIC PROMINENCE per event type over
    the daily cents-value series — the find_peaks classic: an interior
    day is a peak iff strictly above both neighbors; its prominence is
    v − max(left_base, right_base), each base the MINIMUM between the
    peak and the nearest strictly-higher day on that side (whole-series
    window when none exists — the global max keys off the series
    minimum). Emits every peak (event_type, day, v_c, prom). One
    (type, day) combiner shuffle; the peak pass runs on the day-bounded
    table; the oracle mirrors with day² window joins."""
    ev = _rp(sf_dir, "events", ["event_type", "ts", "value"])

    def _day(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": df["event_type"].astype(str),
            "day": df["ts"].astype("int64").to_numpy() // 86_400_000_000,
            "vc": cents(df["value"].to_numpy())})

    daily = rel.partial_groupby_sum(
        ev.map_batches(_day, batch_format="pandas", batch_size=8192),
        ["event_type", "day"], ["vc"], est_rows=_nrows(sf_dir, "events"))
    df = daily.to_pandas()  # (types × days)-bounded
    rows = []
    for et, g in df.groupby("event_type"):
        d = g.sort_values("day")
        days = d["day"].to_numpy(np.int64)
        v = d["vc"].to_numpy(np.int64)
        n = len(d)
        for i in range(1, n - 1):
            if not (v[i] > v[i - 1] and v[i] > v[i + 1]):
                continue
            higher_l = [j for j in range(i) if v[j] > v[i]]
            lo = max(higher_l) + 1 if higher_l else 0
            left_base = int(v[lo:i].min())
            higher_r = [j for j in range(i + 1, n) if v[j] > v[i]]
            hi = min(higher_r) if higher_r else n
            right_base = int(v[i + 1:hi].min())
            prom = int(v[i]) - max(left_base, right_base)
            rows.append({"event_type": str(et), "day": int(days[i]),
                         "v_c": int(v[i]), "prom": prom})
    return pd.DataFrame(rows)


SQL_EVENTS_PEAK_PROMINENCE = """
WITH daily AS (
  SELECT event_type,
         CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day,
         SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS vc
  FROM events GROUP BY 1, 2
),
rk AS (
  SELECT event_type, day, vc,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i,
         COUNT(*) OVER (PARTITION BY event_type) AS n,
         LAG(vc) OVER (PARTITION BY event_type ORDER BY day) AS pv,
         LEAD(vc) OVER (PARTITION BY event_type ORDER BY day) AS nv
  FROM daily
),
pk AS (
  SELECT * FROM rk WHERE i > 1 AND i < n AND vc > pv AND vc > nv
),
lb AS (
  SELECT p.event_type, p.i, MIN(o.vc) AS left_base
  FROM pk p JOIN rk o ON o.event_type = p.event_type AND o.i < p.i
  WHERE o.i > COALESCE((SELECT MAX(h.i) FROM rk h
                        WHERE h.event_type = p.event_type
                          AND h.i < p.i AND h.vc > p.vc), 0)
  GROUP BY p.event_type, p.i
),
rb AS (
  SELECT p.event_type, p.i, MIN(o.vc) AS right_base
  FROM pk p JOIN rk o ON o.event_type = p.event_type AND o.i > p.i
  WHERE o.i < COALESCE((SELECT MIN(h.i) FROM rk h
                        WHERE h.event_type = p.event_type
                          AND h.i > p.i AND h.vc > p.vc), p.n + 1)
  GROUP BY p.event_type, p.i
)
SELECT pk.event_type, CAST(pk.day AS BIGINT) AS day,
       CAST(pk.vc AS BIGINT) AS v_c,
       CAST(pk.vc - GREATEST(lb.left_base, rb.right_base) AS BIGINT) AS prom
FROM pk
JOIN lb ON lb.event_type = pk.event_type AND lb.i = pk.i
JOIN rb ON rb.event_type = pk.event_type AND rb.i = pk.i
"""


def q_grid_pit_fill(sf_dir: str):  # exact oracle (unrolled min-relax)
    """DEPRESSION FILLING over the density DEM (Planchon–Darboux, the
    hydrology pre-pass that makes D8 routing sound — closed pits would
    otherwise trap flow; completes the suite next to `grid_flow_d8` /
    `grid_flow_basins`): water level W starts at the elevation on the
    raster border and +∞ inside, then 6 synchronous rounds of
    W(c) = max(e(c), min₈ W(n)) drain every cell whose spill path is ≤ 6
    steps (the fixed-round convention of the raster suite). Emits only
    the FILLED cells (cx, cy, v, w) with w > v — the lakes. One raster
    combiner; rounds are grid-bounded 8-shift numpy min-relaxations;
    oracle unrolls the same rounds as 9-way joins over the full grid."""
    pts = conflation.read_points(sf_dir)
    from ..stages.relational import partial_groupby_sum

    def _cells_of(batch: pa.Table) -> pa.Table:
        x = batch["px"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch["py"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"cx": x // 1024, "cy": y // 1024})

    raw = pts.map_batches(_cells_of, batch_format="pyarrow", batch_size=8192)
    density = partial_groupby_sum(raw, ["cx", "cy"], [], count_as="v",
                                  est_rows=_nrows(sf_dir, "lineitem"))
    dtab = density.to_pandas()
    elev = np.zeros((64, 64), np.int64)
    elev[dtab["cy"].to_numpy(np.int64), dtab["cx"].to_numpy(np.int64)] = \
        dtab["v"].to_numpy(np.int64)
    big = int(elev.max()) + 1
    w = np.full((64, 64), big, np.int64)
    border = np.zeros((64, 64), bool)
    border[0, :] = border[-1, :] = border[:, 0] = border[:, -1] = True
    w[border] = elev[border]
    for _ in range(6):
        nmin = np.full((64, 64), big, np.int64)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                sh = np.full((64, 64), big, np.int64)
                ys = slice(max(dy, 0), 64 + min(dy, 0))
                yd = slice(max(-dy, 0), 64 + min(-dy, 0))
                xs2 = slice(max(dx, 0), 64 + min(dx, 0))
                xd = slice(max(-dx, 0), 64 + min(-dx, 0))
                sh[ys, xs2] = w[yd, xd]
                nmin = np.minimum(nmin, sh)
        new_w = np.maximum(elev, nmin)
        new_w[border] = elev[border]
        w = new_w
    cy, cx = np.nonzero(w > elev)
    return pd.DataFrame({"cx": cx.astype(np.int64),
                         "cy": cy.astype(np.int64),
                         "v": elev[cy, cx], "w": w[cy, cx]})


def _pit_round_sql(r: int) -> str:
    return f""",
w{r + 1} AS (
  SELECT g.cx, g.cy, g.v, g.brd,
         CASE WHEN g.brd THEN g.v
              ELSE GREATEST(g.v, MIN(o.w)) END AS w
  FROM grid g
  JOIN w{r} o
    ON ABS(o.cx - g.cx) <= 1 AND ABS(o.cy - g.cy) <= 1
   AND NOT (o.cx = g.cx AND o.cy = g.cy)
  GROUP BY g.cx, g.cy, g.v, g.brd
)"""


SQL_GRID_PIT_FILL = _CTES + """,
cells AS (
  SELECT px // 1024 AS cx, py // 1024 AS cy, CAST(COUNT(*) AS BIGINT) AS v
  FROM points GROUP BY 1, 2
),
grid AS (
  SELECT gx.cx, gy.cy, COALESCE(c.v, 0) AS v,
         gx.cx IN (0, 63) OR gy.cy IN (0, 63) AS brd
  FROM (SELECT unnest(range(64)) AS cx) gx
  CROSS JOIN (SELECT unnest(range(64)) AS cy) gy
  LEFT JOIN cells c ON c.cx = gx.cx AND c.cy = gy.cy
),
big AS (SELECT MAX(v) + 1 AS b FROM grid),
w0 AS (
  SELECT cx, cy, v, brd, CASE WHEN brd THEN v ELSE (SELECT b FROM big) END AS w
  FROM grid
)""" + "".join(_pit_round_sql(r) for r in range(6)) + """
SELECT CAST(cx AS BIGINT) AS cx, CAST(cy AS BIGINT) AS cy,
       CAST(v AS BIGINT) AS v, CAST(w AS BIGINT) AS w
FROM w6 WHERE w > v
"""


def q_part_wagner_whitin(sf_dir: str):  # exact oracle (bitmask brute)
    """WAGNER–WHITIN dynamic lot sizing per part (every 4th part) — the
    OR inventory-planning classic: monthly demands d_1..d_12 (quantity
    sums), fixed order cost K = 500, holding cost 1 per unit-month; the
    optimal plan orders at a subset of months including month 1 (each order covering demand up
    to the next order), minimized exactly by the O(T²) DP
    C(t) = min_j C(j−1) + K + Σ_{i=j..t}(i−j)·d_i. Emits (l_partkey,
    total_cost, n_orders) with n_orders from the lexicographically-
    earliest argmin backtrack. The oracle takes the sledgehammer dual:
    enumerate ALL 2¹¹ order-point bitmasks in SQL and take the same
    (cost, n_orders)-min — DP vs exhaustive search agreeing IS the
    optimality proof, run at every scale. One (part, month) combiner;
    the DP is a parts-bounded epilogue."""
    li = _rp(sf_dir, "lineitem", ["l_partkey", "l_shipdate", "l_quantity"])

    def _prep(batch: pa.Table) -> pa.Table:
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = pk % 4 == 0
        sub = batch.filter(pa.array(keep))
        ts = sub["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        mo = (ts.astype("datetime64[us]").astype("datetime64[M]")
              .astype(np.int64) % 12 + 1)
        return pa.table({"l_partkey": pk[keep], "mo": mo,
                         "d": cents(sub["l_quantity"]
                                    .to_numpy(zero_copy_only=False), 1)})

    prep = li.map_batches(_prep, batch_format="pyarrow", batch_size=8192)
    sums = rel.partial_groupby_sum(prep, ["l_partkey", "mo"], ["d"],
                                   est_rows=_nrows(sf_dir, "lineitem"))
    df = sums.to_pandas()  # parts×12-bounded
    piv = df.pivot_table(index="l_partkey", columns="mo", values="d",
                         aggfunc="sum", fill_value=0)
    piv = piv.reindex(columns=range(1, 13), fill_value=0).astype(np.int64)
    K = 500
    rows = []
    for pk2, row in piv.iterrows():
        d = row.to_numpy(np.int64)
        T = 12
        # C[t] = best cost covering months 1..t; ORD[t] = orders used,
        # ties -> fewer orders, then earliest last-order month j
        best = [(0, 0)] + [None] * T
        for t in range(1, T + 1):
            cands = []
            for j in range(1, t + 1):
                hold = sum((i - j) * int(d[i - 1]) for i in range(j, t + 1))
                cands.append((best[j - 1][0] + K + hold,
                              best[j - 1][1] + 1, j))
            best[t] = min(cands)[:2]
        rows.append({"l_partkey": int(pk2), "total_cost": best[T][0],
                     "n_orders": best[T][1]})
    return pd.DataFrame(rows)


SQL_PART_WAGNER_WHITIN = """
WITH dm AS (
  SELECT l_partkey, CAST(EXTRACT(month FROM l_shipdate) AS BIGINT) AS mo,
         SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS d
  FROM lineitem WHERE l_partkey % 4 = 0
  GROUP BY 1, 2
),
grid AS (
  SELECT p.l_partkey, mm.mo, COALESCE(dm.d, 0) AS d
  FROM (SELECT DISTINCT l_partkey FROM dm) p
  CROSS JOIN (SELECT unnest(range(1, 13)) AS mo) mm
  LEFT JOIN dm ON dm.l_partkey = p.l_partkey AND dm.mo = mm.mo
),
masks AS (
  SELECT 1 + 2 * m.m AS mask  -- month 1 always orders (bit 0 set)
  FROM (SELECT unnest(range(0, 2048)) AS m) m
),
plan AS (
  SELECT g.l_partkey, k.mask, g.mo, g.d,
         -- the order month covering g.mo: highest set bit <= mo
         (SELECT MAX(b.b + 1) FROM (SELECT unnest(range(0, 12)) AS b) b
          WHERE b.b + 1 <= g.mo AND (k.mask >> b.b) & 1 = 1) AS ord_mo
  FROM grid g CROSS JOIN masks k
),
cost AS (
  SELECT l_partkey, mask,
         CAST(500 * bit_count(mask) AS BIGINT)
           + SUM((mo - ord_mo) * d) AS total_cost,
         CAST(bit_count(mask) AS BIGINT) AS n_orders
  FROM plan GROUP BY l_partkey, mask
),
best AS (
  SELECT l_partkey, total_cost, n_orders,
         ROW_NUMBER() OVER (PARTITION BY l_partkey
                            ORDER BY total_cost, n_orders, mask) AS rn
  FROM cost
)
SELECT l_partkey, CAST(total_cost AS BIGINT) AS total_cost,
       CAST(n_orders AS BIGINT) AS n_orders
FROM best WHERE rn = 1
"""


def q_grid_semivariogram(sf_dir: str):  # exact oracle (shifted joins)
    """EMPIRICAL SEMIVARIOGRAM pieces of the density raster — the
    geostatistics / kriging entry point: for lag offsets (1,0) (0,1)
    (1,1) (2,0) (0,2), the pair count and Σ(v(c) − v(c+h))² over all
    cell pairs of the FULL 64×64 grid (empties are 0-elevation, as in
    the rest of the raster suite); γ(h) = sq_sum / 2n is the caller's
    one-liner, and the (1,0)-vs-(0,1) asymmetry is the ANISOTROPY
    screen. One raster combiner + five vectorized shifted-difference
    passes on the grid-bounded table. Emits (dx, dy, n_pairs, sq_sum)."""
    pts = conflation.read_points(sf_dir)
    from ..stages.relational import partial_groupby_sum

    def _cells_of(batch: pa.Table) -> pa.Table:
        x = batch["px"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch["py"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"cx": x // 1024, "cy": y // 1024})

    raw = pts.map_batches(_cells_of, batch_format="pyarrow", batch_size=8192)
    density = partial_groupby_sum(raw, ["cx", "cy"], [], count_as="v",
                                  est_rows=_nrows(sf_dir, "lineitem"))
    dtab = density.to_pandas()
    elev = np.zeros((64, 64), np.int64)
    elev[dtab["cy"].to_numpy(np.int64), dtab["cx"].to_numpy(np.int64)] = \
        dtab["v"].to_numpy(np.int64)
    rows = []
    for dx, dy in ((1, 0), (0, 1), (1, 1), (2, 0), (0, 2)):
        a = elev[0:64 - dy, 0:64 - dx]
        b = elev[dy:64, dx:64]
        diff = a - b
        rows.append({"dx": dx, "dy": dy, "n_pairs": diff.size,
                     "sq_sum": int((diff * diff).sum())})
    return pd.DataFrame(rows).astype(np.int64)


SQL_GRID_SEMIVARIOGRAM = _CTES + """,
cells AS (
  SELECT px // 1024 AS cx, py // 1024 AS cy, CAST(COUNT(*) AS BIGINT) AS v
  FROM points GROUP BY 1, 2
),
grid AS (
  SELECT gx.cx, gy.cy, COALESCE(c.v, 0) AS v
  FROM (SELECT unnest(range(64)) AS cx) gx
  CROSS JOIN (SELECT unnest(range(64)) AS cy) gy
  LEFT JOIN cells c ON c.cx = gx.cx AND c.cy = gy.cy
),
lags(dx, dy) AS (VALUES (1, 0), (0, 1), (1, 1), (2, 0), (0, 2))
SELECT l.dx, l.dy, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM((a.v - b.v) * (a.v - b.v)) AS BIGINT) AS sq_sum
FROM lags l
JOIN grid a ON a.cx < 64 - l.dx AND a.cy < 64 - l.dy
JOIN grid b ON b.cx = a.cx + l.dx AND b.cy = a.cy + l.dy
GROUP BY l.dx, l.dy
"""


def q_nation_cvar_pieces(sf_dir: str):  # exact oracle (tail rank sum)
    """EXPECTED SHORTFALL (CVaR) pieces per nation — the coherent tail-
    risk metric beyond quantiles: over the nation's DAILY revenue-cents
    series, the worst ⌊n/10⌋ days' count and sum (ties by day asc so
    the tail set is deterministic); CVaR₉₀ = tail_sum / tail_n. Emits
    (n_name, n_days, tail_n, tail_sum); nations with < 10 days emit
    tail_n = 0 and tail_sum = 0. One (nation, day) combiner; the tail
    rank runs on the nations×days-bounded table."""
    od = _rp(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    c2n = dict(zip(cust["c_custkey"].to_numpy().tolist(),
                   cust["c_nationkey"].to_numpy().tolist()))
    n2name = dict(zip(nat["n_nationkey"].to_numpy().tolist(),
                      nat["n_name"].to_pylist()))
    c2n_ref = ray.put(c2n)

    def _day(batch: pa.Table) -> pa.Table:
        from ..stages.util import cached_state

        lookup = cached_state(c2n_ref, lambda d: d, token="cvar.c2n")
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch["o_orderdate"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "nk": np.array([lookup[int(c)] for c in ck], np.int64),
            "day": ts // 86_400_000_000,
            "rev": cents(batch["o_totalprice"].to_numpy(zero_copy_only=False))})

    daily = rel.partial_groupby_sum(
        od.map_batches(_day, batch_format="pyarrow", batch_size=8192),
        ["nk", "day"], ["rev"], est_rows=_nrows(sf_dir, "orders"))
    df = daily.to_pandas()  # nations×days-bounded
    rows = []
    for nk2, g in df.groupby("nk"):
        d = g.sort_values(["rev", "day"], kind="mergesort")
        n = len(d)
        tail_n = n // 10
        tail = d.head(tail_n)
        rows.append({"n_name": n2name[int(nk2)], "n_days": n,
                     "tail_n": tail_n,
                     "tail_sum": int(tail["rev"].sum()) if tail_n else 0})
    return pd.DataFrame(rows)


SQL_NATION_CVAR_PIECES = """
WITH daily AS (
  SELECT n.n_name,
         CAST(epoch_us(o.o_orderdate) AS BIGINT) // 86400000000 AS day,
         SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS rev
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2
),
rk AS (
  SELECT n_name, rev,
         ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY rev, day) AS i,
         COUNT(*) OVER (PARTITION BY n_name) AS n
  FROM daily
)
SELECT n_name, CAST(MAX(n) AS BIGINT) AS n_days,
       CAST(MAX(n) // 10 AS BIGINT) AS tail_n,
       CAST(COALESCE(SUM(rev) FILTER (i <= n // 10), 0) AS BIGINT)
         AS tail_sum
FROM rk GROUP BY n_name
"""


def q_image_thinning_step(sf_dir: str):  # exact oracle (stripe closed form)
    """One ZHANG–SUEN THINNING sub-iteration through the decode path
    (``media.image_thinning_step``) — the skeletonization building block
    (2 ≤ B ≤ 6, A = 1, directional products zero) that erodes strokes
    toward 1-px centerlines while preserving connectivity. On the
    full-height R-parity stripe fixture the rule COLLAPSES per column to
    del_interior = m∧l∧¬r (the left-erosion face of step 1),
    del_top = m∧(l⊕r), del_bot = m∧(l∨r) — derived by evaluating
    B/A/c1/c2 on the three row classes; the Σ(31j+17i) checksum gets
    closed-form row weights. The kernel is the general 2-D rule (pytest
    fuzzes it against a per-pixel brute force)."""
    docs = _rp(sf_dir, "documents", ["doc_id"])

    synth = docs.map_batches(_image_fixture_synth, batch_format="pyarrow", batch_size=512)
    return mstage.image_thinning_step(synth, batch_size=512)


SQL_IMAGE_THINNING_STEP = """
WITH im AS (
  SELECT doc_id AS image_id,
         16 + (doc_id % 4) * 8 AS w, 12 + (doc_id % 3) * 6 AS h,
         doc_id % 3 AS fi,
         (doc_id * 7) % 200 AS br
  FROM documents
),
rq AS (
  SELECT image_id, j, w, h,
         (CASE WHEN fi = 2
               THEN ((br + (j * 55) // (w - 1)) // 4) * 4
                    + ((br + (j * 55) // (w - 1)) // 4) // 16
               ELSE br + (j * 55) // (w - 1) END) % 2 AS m
  FROM im, (SELECT unnest(range(40)) AS j) js WHERE j < w
),
nb AS (
  SELECT image_id, j, w, h, m,
         COALESCE(LAG(m)  OVER (PARTITION BY image_id ORDER BY j), 0) AS l,
         COALESCE(LEAD(m) OVER (PARTITION BY image_id ORDER BY j), 0) AS r
  FROM rq
),
cols AS (
  SELECT image_id, j, w, h, m,
         CASE WHEN m = 1 AND l = 1 AND r = 0 THEN 1 ELSE 0 END AS d_int,
         CASE WHEN m = 1 AND l + r = 1 THEN 1 ELSE 0 END AS d_top,
         CASE WHEN m = 1 AND l + r >= 1 THEN 1 ELSE 0 END AS d_bot
  FROM nb
)
SELECT image_id,
       CAST(h * SUM(m) AS BIGINT) AS n_mask,
       CAST(SUM((h - 2) * d_int + d_top + d_bot) AS BIGINT) AS n_del,
       CAST(SUM(d_int * (31 * j * (h - 2) + 17 * (h - 2) * (h - 1) // 2)
                + d_top * 31 * j
                + d_bot * (31 * j + 17 * (h - 1))) AS BIGINT) AS del_chk
FROM cols GROUP BY image_id, h
"""


def q_customer_er_blocking(sf_dir: str):  # exact oracle (block self-join)
    """ENTITY-RESOLUTION BLOCKING + verify — the canonical two-phase ER
    shape (blocking keeps the pair space near-linear; the quadratic
    verify runs only inside blocks): block key = $1000 balance bucket
    (offset before the divide so floor and trunc agree on negative
    balances); inside each block, candidate pairs lie within $20 of
    balance (key-asc pairs), and a candidate "matches" when nation AND
    market segment agree. Cross-block near-pairs are missed BY DESIGN —
    that recall loss is the blocking trade-off the operator measures.
    Emits per block (blk, n_candidates, n_matches). One bucketed group
    shuffle; the verify is a vectorized sort + two-pointer window."""
    from ..stages.relational import bucketed_groups

    cust = _rp(sf_dir, "customer", ["c_custkey", "c_nationkey",
                                    "c_acctbal", "c_mktsegment"])

    def _prep(batch: pa.Table) -> pa.Table:
        bal = cents(batch["c_acctbal"].to_numpy(zero_copy_only=False))
        return pa.table({
            "c_custkey": batch["c_custkey"].cast(pa.int64()),
            "nk": batch["c_nationkey"].cast(pa.int64()),
            "bal": bal, "blk": (bal + 100000) // 100000,
            "seg": batch["c_mktsegment"].cast(pa.string())})

    prep = cust.map_batches(_prep, batch_format="pyarrow", batch_size=8192)

    def _verify(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["blk", "bal", "c_custkey"], kind="mergesort")
        nk = d["nk"].to_numpy(np.int64)
        blk = d["blk"].to_numpy(np.int64)
        bal = d["bal"].to_numpy(np.int64)
        seg = d["seg"].to_numpy()
        n = len(d)
        new_b = np.ones(n, dtype=bool)
        new_b[1:] = blk[1:] != blk[:-1]
        starts = np.flatnonzero(new_b)
        rows = []
        for a, b in zip(starts, np.append(starts[1:], n)):
            cnt = mt = 0
            for i in range(a, b):
                j = i + 1
                while j < b and bal[j] - bal[i] <= 2000:
                    cnt += 1
                    if nk[j] == nk[i] and seg[j] == seg[i]:
                        mt += 1
                    j += 1
            if cnt:
                rows.append({"blk": int(blk[a]), "n_candidates": cnt,
                             "n_matches": mt})
        return pd.DataFrame(rows)

    return bucketed_groups(prep, ["blk"], _verify)


SQL_CUSTOMER_ER_BLOCKING = """
WITH b AS (
  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nk,
         CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS bal,
         (CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) + 100000)
           // 100000 AS blk,
         c_mktsegment AS seg
  FROM customer
),
cand AS (
  SELECT a.blk,
         CASE WHEN a.seg = c.seg AND a.nk = c.nk THEN 1 ELSE 0 END
           AS is_match
  FROM b a JOIN b c
    ON c.blk = a.blk
   AND (c.bal > a.bal OR (c.bal = a.bal AND c.c_custkey > a.c_custkey))
   AND c.bal - a.bal <= 2000
)
SELECT blk, CAST(COUNT(*) AS BIGINT) AS n_candidates,
       CAST(SUM(is_match) AS BIGINT) AS n_matches
FROM cand GROUP BY blk
"""


def q_orders_did_pieces(sf_dir: str):  # exact oracle (2x2 cell sums)
    """DIFFERENCE-IN-DIFFERENCES pieces — the causal-inference workhorse
    as exact rationals: treatment = odd customer key, post-period =
    order year ≥ 1996, outcome = order total in cents. Emits the 2×2
    cell table (grp, post, vc, n); DiD = (ȳ11−ȳ10) − (ȳ01−ȳ00) is the
    caller's exact-rational fold over the four rows. One combiner-first
    shuffle; nothing materializes."""
    od = _rp(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])

    def _cell(batch: pa.Table) -> pa.Table:
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch["o_orderdate"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        yr = (ts.astype("datetime64[us]").astype("datetime64[Y]")
              .astype(np.int64) + 1970)
        return pa.table({"grp": ck % 2, "post": (yr >= 1996).astype(np.int64),
                         "vc": cents(batch["o_totalprice"]
                                     .to_numpy(zero_copy_only=False))})

    cells = od.map_batches(_cell, batch_format="pyarrow", batch_size=8192)
    return rel.partial_groupby_sum(cells, ["grp", "post"], ["vc"],
                                   count_as="n",
                                   est_rows=_nrows(sf_dir, "orders"))


SQL_ORDERS_DID_PIECES = """
SELECT o_custkey % 2 AS grp,
       CASE WHEN EXTRACT(year FROM o_orderdate) >= 1996
            THEN 1 ELSE 0 END AS post,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS vc,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders GROUP BY 1, 2
"""


def q_image_nms_edges(sf_dir: str):  # exact oracle (local-max product)
    """CANNY NON-MAXIMUM SUPPRESSION through the decode path
    (``media.image_nms_edges``): central-difference luma gradient,
    magnitude |dx|+|dy| ≥ 8, survive only as a strict local max along
    the dominant gradient axis — the thinning stage between
    `image_grad_orientation` and hysteresis that turns smeared ridges
    into 1-px edge chains. On the factorized fixture m = A(j) + B(i),
    so along-axis comparisons cancel the other axis and the oracle is a
    1-D×1-D cross join of local-max flags + the axis-dominance CASE."""
    docs = _rp(sf_dir, "documents", ["doc_id"])

    synth = docs.map_batches(_image_fixture_synth, batch_format="pyarrow", batch_size=512)
    return mstage.image_nms_edges(synth, batch_size=512)


SQL_IMAGE_NMS_EDGES = """
WITH im AS (
  SELECT doc_id AS image_id,
         16 + (doc_id % 4) * 8 AS w, 12 + (doc_id % 3) * 6 AS h,
         doc_id % 3 AS fi,
         (doc_id * 7) % 200 AS br, (doc_id * 11) % 200 AS bg
  FROM documents
),
fq AS (
  SELECT image_id, j,
         CASE WHEN fi = 2
              THEN ((br + (j * 55) // (w - 1)) // 4) * 4
                   + ((br + (j * 55) // (w - 1)) // 4) // 16
              ELSE br + (j * 55) // (w - 1) END AS f
  FROM im, (SELECT unnest(range(40)) AS j) js WHERE j < w
),
aq AS (
  SELECT image_id, j,
         ABS(LEAD(f) OVER wj - LAG(f) OVER wj) AS a
  FROM fq WINDOW wj AS (PARTITION BY image_id ORDER BY j)
),
a2 AS (
  SELECT image_id, j, a,
         a > LAG(a)  OVER wj AND a > LEAD(a) OVER wj AS amax
  FROM aq WINDOW wj AS (PARTITION BY image_id ORDER BY j)
),
gq AS (
  SELECT image_id, r,
         CASE WHEN fi = 2
              THEN ((bg + (r * 41) // (h - 1)) // 4) * 4
                   + ((bg + (r * 41) // (h - 1)) // 4) // 16
              ELSE bg + (r * 41) // (h - 1) END AS g
  FROM im, (SELECT unnest(range(24)) AS r) rs2 WHERE r < h
),
bq AS (
  SELECT image_id, r,
         ABS(LEAD(g) OVER wr - LAG(g) OVER wr) AS b
  FROM gq WINDOW wr AS (PARTITION BY image_id ORDER BY r)
),
b2 AS (
  SELECT image_id, r, b,
         b > LAG(b)  OVER wr AND b > LEAD(b) OVER wr AS bmax
  FROM bq WINDOW wr AS (PARTITION BY image_id ORDER BY r)
),
px AS (
  SELECT a2.image_id, a2.j, b2.r
  FROM a2
  JOIN im ON im.image_id = a2.image_id
  JOIN b2 ON b2.image_id = a2.image_id
  WHERE a2.j BETWEEN 2 AND im.w - 3 AND b2.r BETWEEN 2 AND im.h - 3
    AND a2.a + b2.b >= 8
    AND CASE WHEN a2.a >= b2.b THEN a2.amax ELSE b2.bmax END
)
SELECT im.image_id,
       CAST(COALESCE(COUNT(px.j), 0) AS BIGINT) AS n_edges,
       CAST(COALESCE(SUM(31 * px.j + 17 * px.r), 0) AS BIGINT) AS edge_chk
FROM im LEFT JOIN px ON px.image_id = im.image_id
GROUP BY im.image_id
"""


def q_events_control_chart(sf_dir: str):  # exact oracle (cross-mult 3σ)
    """SHEWHART CONTROL CHART per event type — the SPC classic: the
    first 15 days of the daily dollar-value series are the baseline
    (sum S, square-sum Q, n); every later day signals out-of-control iff
    (x·n − S)² > 9·(n·Q − S²) — the ±3σ rule cross-multiplied to exact
    integers (dollar scale keeps squares inside int64). Emits per type
    (n_base, n_monitored, n_signals, first_signal_day; −1 when quiet).
    One (type, day) combiner; baseline + scan on the day-bounded
    table."""
    ev = _rp(sf_dir, "events", ["event_type", "ts", "value"])

    def _day(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": df["event_type"].astype(str),
            "day": df["ts"].astype("int64").to_numpy() // 86_400_000_000,
            "vc": cents(df["value"].to_numpy())})

    daily = rel.partial_groupby_sum(
        ev.map_batches(_day, batch_format="pandas", batch_size=8192),
        ["event_type", "day"], ["vc"], est_rows=_nrows(sf_dir, "events"))
    df = daily.to_pandas()
    df["vd"] = df["vc"].astype(np.int64) // 100  # divide AFTER the day sum
    rows = []
    for et, g in df.groupby("event_type"):
        d = g.sort_values("day")
        days = d["day"].to_numpy(np.int64)
        x = d["vd"].to_numpy(np.int64)
        nb = min(15, len(d))
        base = x[:nb]
        s = int(base.sum())
        q = int((base * base).sum())
        mon = x[nb:]
        lhs = (mon * nb - s) ** 2
        rhs = 9 * (nb * q - s * s)
        sig = lhs > rhs
        first = int(days[nb:][np.argmax(sig)]) if sig.any() else -1
        rows.append({"event_type": str(et), "n_base": nb,
                     "n_monitored": len(mon),
                     "n_signals": int(sig.sum()),
                     "first_signal_day": first})
    return pd.DataFrame(rows)


SQL_EVENTS_CONTROL_CHART = """
WITH daily AS (
  SELECT event_type,
         CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day,
         SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) // 100 AS vd
  FROM events GROUP BY 1, 2
),
ordd AS (
  SELECT event_type, day, vd,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM daily
),
base AS (
  SELECT event_type, LEAST(MAX(n), 15) AS nb,
         SUM(vd) FILTER (i <= 15) AS s,
         SUM(vd * vd) FILTER (i <= 15) AS q
  FROM ordd GROUP BY event_type
),
mon AS (
  SELECT o.event_type, o.day, o.vd, b.nb, b.s, b.q,
         (o.vd * b.nb - b.s) * (o.vd * b.nb - b.s)
           > 9 * (b.nb * b.q - b.s * b.s) AS sig
  FROM ordd o JOIN base b ON b.event_type = o.event_type
  WHERE o.i > 15
)
SELECT b.event_type, CAST(b.nb AS BIGINT) AS n_base,
       CAST(COALESCE(COUNT(m.day), 0) AS BIGINT) AS n_monitored,
       CAST(COALESCE(SUM(CASE WHEN m.sig THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_signals,
       CAST(COALESCE(MIN(m.day) FILTER (m.sig), -1) AS BIGINT)
         AS first_signal_day
FROM base b LEFT JOIN mon m ON m.event_type = b.event_type
GROUP BY b.event_type, b.nb
"""


def q_orders_price_index(sf_dir: str):  # exact oracle (basket sums)
    """LASPEYRES vs PAASCHE PRICE-INDEX pieces — index-number economics
    as exact integers: base period 1995 vs every later year over the
    parts present in both; with per-part period totals rev (cents) and
    qty, the value-weighted (unit-value) index pieces are
    lasp = Σ rev_y·qty_0 / Σ rev_0·qty_0 and
    paas = Σ rev_y·qty_y / Σ rev_0·qty_y — division-free numerator/
    denominator pairs (the index is the caller's rational fold), the
    inflation-measurement classic whose two weightings bracket the true
    index. One (part, year) combiner; the basket join runs on the
    parts×years-bounded table. Emits
    (yr, n_parts, lasp_num, lasp_den, paas_num, paas_den)."""
    li = _rp(sf_dir, "lineitem", ["l_partkey", "l_shipdate",
                                  "l_quantity", "l_extendedprice"])

    def _prep(batch: pa.Table) -> pa.Table:
        ts = batch["l_shipdate"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        yr = (ts.astype("datetime64[us]").astype("datetime64[Y]")
              .astype(np.int64) + 1970)
        return pa.table({
            "l_partkey": batch["l_partkey"].cast(pa.int64()), "yr": yr,
            "qty": cents(batch["l_quantity"].to_numpy(zero_copy_only=False),
                         1),
            "rev": cents(batch["l_extendedprice"]
                         .to_numpy(zero_copy_only=False))})

    prep = li.map_batches(_prep, batch_format="pyarrow", batch_size=8192)
    sums = rel.partial_groupby_sum(prep, ["l_partkey", "yr"],
                                   ["qty", "rev"],
                                   est_rows=_nrows(sf_dir, "lineitem"))
    df = sums.to_pandas()  # parts×years-bounded
    base = df[df["yr"] == 1995].set_index("l_partkey")
    rows = []
    for yr, g in df[df["yr"] > 1995].groupby("yr"):
        g = g.set_index("l_partkey")
        common = g.index.intersection(base.index)
        gy = g.loc[common]
        b0 = base.loc[common]
        rows.append({
            "yr": int(yr), "n_parts": len(common),
            "lasp_num": int((gy["rev"] * b0["qty"]).sum()),
            "lasp_den": int((b0["rev"] * b0["qty"]).sum()),
            "paas_num": int((gy["rev"] * gy["qty"]).sum()),
            "paas_den": int((b0["rev"] * gy["qty"]).sum())})
    return pd.DataFrame(rows)


SQL_ORDERS_PRICE_INDEX = """
WITH py AS (
  SELECT l_partkey, CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS yr,
         SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS qty,
         SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS rev
  FROM lineitem GROUP BY 1, 2
),
b AS (SELECT l_partkey, qty AS q0, rev AS r0 FROM py WHERE yr = 1995),
c AS (SELECT * FROM py WHERE yr > 1995)
SELECT c.yr, CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(c.rev * b.q0) AS BIGINT) AS lasp_num,
       CAST(SUM(b.r0 * b.q0) AS BIGINT) AS lasp_den,
       CAST(SUM(c.rev * c.qty) AS BIGINT) AS paas_num,
       CAST(SUM(b.r0 * c.qty) AS BIGINT) AS paas_den
FROM c JOIN b ON b.l_partkey = c.l_partkey
GROUP BY c.yr
"""


def q_traj_hampel_outliers(sf_dir: str):  # exact oracle (window quantiles)
    """HAMPEL FILTER per user trajectory — the robust outlier detector
    every GPS cleaning pass runs before smoothing: over the ordered
    x-coordinate series, each interior point (window ±2) is an outlier
    iff |x − median₅| > 3·MAD₅ (median and MAD are exact order
    statistics of 5 values; a zero MAD flags any deviation — the
    documented degenerate case). Emits per user (n_pts, n_outliers,
    out_chk = Σ window-position of outliers). Engine: one bucketed
    shuffle + per-user sliding-window partition; oracle: window self-
    join + two QUANTILE_DISC levels."""
    from ..stages.relational import bucketed_groups

    ev = _rp(sf_dir, "events", ["event_id", "user_id", "ts"])

    def _pts(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"user_id": uid, "event_id": eid,
                         "e": batch["ts"].cast(pa.int64()),
                         "x": (eid * 48271 + uid * 977) % 65536})

    pts = ev.map_batches(_pts, batch_format="pyarrow", batch_size=8192)

    def _hampel(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["user_id", "e", "event_id"], kind="mergesort")
        uid = d["user_id"].to_numpy(np.int64)
        x = d["x"].to_numpy(np.int64)
        n = len(d)
        new_u = np.ones(n, dtype=bool)
        new_u[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(new_u)
        rows = []
        for a, b in zip(starts, np.append(starts[1:], n)):
            xs = x[a:b]
            m = len(xs)
            cnt = chk = 0
            for i in range(2, m - 2):
                w5 = np.sort(xs[i - 2:i + 3])
                med = int(w5[2])
                mad = int(np.sort(np.abs(xs[i - 2:i + 3] - med))[2])
                if abs(int(xs[i]) - med) > 3 * mad:
                    cnt += 1
                    chk += i + 1  # 1-based position
            rows.append({"user_id": int(uid[a]), "n_pts": m,
                         "n_outliers": cnt, "out_chk": chk})
        return pd.DataFrame(rows)

    return bucketed_groups(pts, ["user_id"], _hampel)


SQL_TRAJ_HAMPEL_OUTLIERS = """
WITH pts AS (
  SELECT user_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i,
         COUNT(*) OVER (PARTITION BY user_id) AS n,
         CAST((event_id * 48271 + user_id * 977) % 65536 AS BIGINT) AS x
  FROM events
),
w1 AS (
  SELECT c.user_id, c.i, c.x AS xc, o.x AS xo
  FROM pts c JOIN pts o
    ON o.user_id = c.user_id AND ABS(o.i - c.i) <= 2
  WHERE c.i >= 3 AND c.i <= c.n - 2
),
med AS (
  SELECT user_id, i, MAX(xc) AS xc,
         QUANTILE_DISC(xo, 0.5) AS med
  FROM w1 GROUP BY user_id, i
),
mad AS (
  SELECT w1.user_id, w1.i, MAX(med.med) AS med, MAX(med.xc) AS xc,
         QUANTILE_DISC(ABS(w1.xo - med.med), 0.5) AS mad
  FROM w1 JOIN med ON med.user_id = w1.user_id AND med.i = w1.i
  GROUP BY w1.user_id, w1.i
),
fl AS (
  SELECT user_id, i,
         CASE WHEN ABS(xc - med) > 3 * mad THEN 1 ELSE 0 END AS o
  FROM mad
)
SELECT p.user_id, CAST(MAX(p.n) AS BIGINT) AS n_pts,
       CAST(COALESCE(SUM(fl.o), 0) AS BIGINT) AS n_outliers,
       CAST(COALESCE(SUM(fl.o * fl.i), 0) AS BIGINT) AS out_chk
FROM (SELECT DISTINCT user_id, n FROM pts) p
LEFT JOIN fl ON fl.user_id = p.user_id
GROUP BY p.user_id
"""


def q_supplier_kendall_tau(sf_dir: str):  # exact oracle (pair self-join)
    """KENDALL RANK CORRELATION pieces between quantity and price per
    supplier — the cross-variable sibling of `supplier_mann_kendall`'s
    trend test: over all lineitem pairs, concordant / discordant /
    x-tied / y-tied counts (τ-b = (nc − nd)/√((n₀−tx)(n₀−ty)) is the
    caller's fold; the pieces are the exact part). One bucketed group
    shuffle; the O(n²) pair scan runs vectorized per supplier. Emits
    (l_suppkey, n_pairs, nc, nd, tx, ty)."""
    from ..stages.relational import bucketed_groups

    li = _rp(sf_dir, "lineitem", ["l_suppkey", "l_quantity",
                                  "l_extendedprice"])

    def _prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_suppkey": batch["l_suppkey"].cast(pa.int64()),
            "q": cents(batch["l_quantity"].to_numpy(zero_copy_only=False),
                       1),
            "p": cents(batch["l_extendedprice"]
                       .to_numpy(zero_copy_only=False))})

    prep = li.map_batches(_prep, batch_format="pyarrow", batch_size=8192)

    def _tau(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["l_suppkey"], kind="mergesort")
        sk = d["l_suppkey"].to_numpy(np.int64)
        q = d["q"].to_numpy(np.int64)
        p = d["p"].to_numpy(np.int64)
        n = len(d)
        new_g = np.ones(n, dtype=bool)
        new_g[1:] = sk[1:] != sk[:-1]
        starts = np.flatnonzero(new_g)
        rows = []
        for a, b in zip(starts, np.append(starts[1:], n)):
            if b - a < 2:
                continue
            qq, pp = q[a:b], p[a:b]
            sq = np.sign(qq[:, None] - qq[None, :])
            sp = np.sign(pp[:, None] - pp[None, :])
            iu = np.triu_indices(b - a, k=1)
            prod = sq[iu] * sp[iu]
            rows.append({"l_suppkey": int(sk[a]),
                         "n_pairs": (b - a) * (b - a - 1) // 2,
                         "nc": int((prod > 0).sum()),
                         "nd": int((prod < 0).sum()),
                         "tx": int((sq[iu] == 0).sum()),
                         "ty": int((sp[iu] == 0).sum())})
        return pd.DataFrame(rows)

    return bucketed_groups(prep, ["l_suppkey"], _tau)


SQL_SUPPLIER_KENDALL_TAU = """
WITH b AS (
  SELECT l_suppkey, CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS q,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS p,
         -- (l_orderkey, l_linenumber) pairs DUPLICATE in the synthetic
         -- fixture, and this CTE is evaluated once per join side: the
         -- ORDER BY must be a TOTAL order (q, p appended) or the two
         -- evaluations can number duplicates differently and the self-
         -- join emits a row paired with itself (a phantom double tie
         -- the gate caught)
         ROW_NUMBER() OVER (PARTITION BY l_suppkey
                            ORDER BY l_orderkey, l_linenumber, q, p) AS i
  FROM lineitem
),
pr AS (
  SELECT a.l_suppkey,
         SIGN(a.q - c.q) * SIGN(a.p - c.p) AS prod,
         CASE WHEN a.q = c.q THEN 1 ELSE 0 END AS xt,
         CASE WHEN a.p = c.p THEN 1 ELSE 0 END AS yt
  FROM b a JOIN b c ON c.l_suppkey = a.l_suppkey AND c.i > a.i
)
SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN prod > 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
       CAST(SUM(CASE WHEN prod < 0 THEN 1 ELSE 0 END) AS BIGINT) AS nd,
       CAST(SUM(xt) AS BIGINT) AS tx, CAST(SUM(yt) AS BIGINT) AS ty
FROM pr GROUP BY l_suppkey
"""


def q_points_diameter(sf_dir: str):  # exact oracle (exhaustive pairs)
    """DIAMETER OF A POINT SET by convex hull + ROTATING CALIPERS over
    the depot tiles (every 10th): farthest pair = an antipodal hull-
    vertex pair, found in O(h) caliper steps after the O(n log n) hull —
    the computational-geometry classic for spatial extent. Emits ONE row
    (n_pts, diam2, a_id, b_id) with the pair ordered (a < b) and
    ties broken by smallest (a, b). The oracle takes the exhaustive
    dual: max dist² over ALL point pairs — calipers agreeing with brute
    force at every scale IS the algorithm's certificate (the
    `part_wagner_whitin` device)."""
    from ..functions.geom import convex_hull_int

    t = td.tiles_table(sf_dir)
    tid = t["tile_id"].to_numpy().astype(np.int64)
    cx = t["cx"].to_numpy().astype(np.int64)
    cy = t["cy"].to_numpy().astype(np.int64)
    pm = tid % 10 == 0
    tid, cx, cy = tid[pm], cx[pm], cy[pm]
    xy = np.stack([cx, cy], axis=1)
    hull = convex_hull_int(xy)
    h = len(hull)
    # map hull vertices back to ids (coords can repeat: smallest id wins)
    best = None
    if h == 1:
        i0 = int(np.lexsort((tid,))[0])
        best = (0, int(tid[i0]), int(tid[i0]))
    else:
        # rotating calipers over the CCW hull
        def d2(i, j):
            dx = int(hull[i][0] - hull[j][0])
            dy = int(hull[i][1] - hull[j][1])
            return dx * dx + dy * dy

        def ids_at(i):
            m = (cx == hull[i][0]) & (cy == hull[i][1])
            return int(tid[m].min())

        j = 1
        for i in range(h):
            nxt = (i + 1) % h
            while True:
                jn = (j + 1) % h
                ex = int(hull[nxt][0] - hull[i][0])
                ey = int(hull[nxt][1] - hull[i][1])
                vx = int(hull[jn][0] - hull[j][0])
                vy = int(hull[jn][1] - hull[j][1])
                if ex * vy - ey * vx > 0:
                    j = jn
                else:
                    break
            for cand_j in (j, (j + 1) % h):
                dd = d2(i, cand_j)
                ia, ib = ids_at(i), ids_at(cand_j)
                a2, b2 = min(ia, ib), max(ia, ib)
                key = (-dd, a2, b2)
                if best is None or key < (-best[0], best[1], best[2]):
                    best = (dd, a2, b2)
    return pd.DataFrame({"n_pts": [len(tid)],
                         "diam2": [best[0]], "a_id": [best[1]],
                         "b_id": [best[2]]})


SQL_POINTS_DIAMETER = f"""WITH tiles AS ({td.TILES_SQL}),
pn AS (SELECT tile_id, cx, cy FROM tiles WHERE tile_id % 10 = 0),
pairs AS (
  SELECT a.tile_id AS ai, b.tile_id AS bi,
         (a.cx - b.cx) * (a.cx - b.cx)
         + (a.cy - b.cy) * (a.cy - b.cy) AS dd
  FROM pn a JOIN pn b ON b.tile_id > a.tile_id
),
best AS (
  SELECT ai, bi, dd,
         ROW_NUMBER() OVER (ORDER BY dd DESC, ai, bi) AS rn
  FROM pairs
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM pn) AS n_pts,
       CAST(dd AS BIGINT) AS diam2, CAST(ai AS BIGINT) AS a_id,
       CAST(bi AS BIGINT) AS b_id
FROM best WHERE rn = 1
"""


def q_user_burstiness(sf_dir: str):  # exact oracle (gap moments)
    """INTER-EVENT BURSTINESS pieces per user (Goh–Barabási B =
    (σ−μ)/(σ+μ) over the inter-event gap distribution — the metric
    separating bursty human/attack traffic from Poisson-like machine
    traffic): exact integer moments of the ordered µs gaps (n_gaps, Σg,
    Σg²); B is the caller's fold. One bucketed shuffle + vectorized
    per-user diff."""
    from ..stages.relational import bucketed_groups

    ev = _rp(sf_dir, "events", ["user_id", "ts", "event_id"])

    def _pre(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "event_id": df["event_id"].to_numpy(np.int64),
            "e": df["ts"].astype("int64").to_numpy()})

    prep = ev.map_batches(_pre, batch_format="pandas", batch_size=8192)

    def _gaps(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["user_id", "e", "event_id"], kind="mergesort")
        uid = d["user_id"].to_numpy(np.int64)
        e = d["e"].to_numpy(np.int64)
        n = len(d)
        new_u = np.ones(n, dtype=bool)
        new_u[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(new_u)
        rows = []
        for a, b in zip(starts, np.append(starts[1:], n)):
            gp = np.diff(e[a:b]) // 1000  # ms keeps squares in int64
            rows.append({"user_id": int(uid[a]), "n_gaps": len(gp),
                         "g_sum": int(gp.sum()),
                         "g_sq": int((gp * gp).sum())})
        return pd.DataFrame(rows)

    return bucketed_groups(prep, ["user_id"], _gaps)


SQL_USER_BURSTINESS = """
WITH o AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS e,
         LAG(CAST(epoch_us(ts) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS pe
  FROM events
),
g AS (SELECT user_id, (e - pe) // 1000 AS gp FROM o WHERE pe IS NOT NULL)
SELECT o.user_id,
       CAST(COALESCE(COUNT(g.gp), 0) AS BIGINT) AS n_gaps,
       CAST(COALESCE(SUM(g.gp), 0) AS BIGINT) AS g_sum,
       CAST(COALESCE(SUM(g.gp * g.gp), 0) AS BIGINT) AS g_sq
FROM (SELECT DISTINCT user_id FROM o) o
LEFT JOIN g ON g.user_id = o.user_id
GROUP BY o.user_id
"""


def q_image_colorfulness(sf_dir: str):  # exact oracle (opponent moments)
    """IMAGE COLORFULNESS pieces (Hasler–Süsstrunk) through the decode
    path: opponent axes rg = R − G and yb2 = R + G − 2B (×2-scaled to
    stay integer); the metric folds from the exact first/second moments
    (n, Σrg, Σrg², Σyb2, Σyb2²) — the no-reference quality screen that
    separates vivid photographs from washed-out or grayscale scans. On
    the fixture rg mixes a column and a row grid so the oracle is the
    product-sum identity Σ(a+b)² = hΣa² + wΣb² + 2ΣaΣb over 1-D
    grids."""
    docs = _rp(sf_dir, "documents", ["doc_id"])

    synth = docs.map_batches(_image_fixture_synth, batch_format="pyarrow", batch_size=512)
    return mstage.image_colorfulness(synth, batch_size=512)


SQL_IMAGE_COLORFULNESS = """
WITH """ + _SQL_IM3 + """,
rq AS (
  SELECT image_id, j,
         CASE WHEN fi = 2
              THEN ((br + (j * 55) // (w - 1)) // 4) * 4
                   + ((br + (j * 55) // (w - 1)) // 4) // 16
              ELSE br + (j * 55) // (w - 1) END AS vr
  FROM im, (SELECT unnest(range(40)) AS j) js WHERE j < w
),
gq AS (
  SELECT image_id, r,
         CASE WHEN fi = 2
              THEN ((bg + (r * 41) // (h - 1)) // 4) * 4
                   + ((bg + (r * 41) // (h - 1)) // 4) // 16
              ELSE bg + (r * 41) // (h - 1) END AS vg
  FROM im, (SELECT unnest(range(24)) AS r) rs2 WHERE r < h
),
rs AS (SELECT image_id, SUM(vr) AS sr, SUM(vr * vr) AS qr,
              COUNT(*) AS w2 FROM rq GROUP BY image_id),
gs AS (SELECT image_id, SUM(vg) AS sg, SUM(vg * vg) AS qg,
              COUNT(*) AS h2 FROM gq GROUP BY image_id)
SELECT im.image_id,
       CAST(w * h AS BIGINT) AS n_px,
       -- rg = vr - vg: Σ over grid = h·Σvr − w·Σvg
       CAST(h * rs.sr - w * gs.sg AS BIGINT) AS rg_sum,
       -- Σ(vr − vg)² = h·Σvr² + w·Σvg² − 2·Σvr·Σvg
       CAST(h * rs.qr + w * gs.qg - 2 * rs.sr * gs.sg AS BIGINT) AS rg_sq,
       -- yb2 = vr + vg − 2b
       CAST(h * rs.sr + w * gs.sg
            - 2 * w * h * (CASE WHEN fi = 2
                                THEN (bb // 4) * 4 + (bb // 4) // 16
                                ELSE bb END) AS BIGINT) AS yb_sum,
       CAST(h * rs.qr + w * gs.qg + 2 * rs.sr * gs.sg
            - 4 * (CASE WHEN fi = 2 THEN (bb // 4) * 4 + (bb // 4) // 16
                        ELSE bb END) * (h * rs.sr + w * gs.sg)
            + 4 * w * h * (CASE WHEN fi = 2
                                THEN (bb // 4) * 4 + (bb // 4) // 16
                                ELSE bb END)
                        * (CASE WHEN fi = 2
                                THEN (bb // 4) * 4 + (bb // 4) // 16
                                ELSE bb END) AS BIGINT) AS yb_sq
FROM im JOIN rs ON rs.image_id = im.image_id
        JOIN gs ON gs.image_id = im.image_id
"""


def q_grid_ripley_k(sf_dir: str):  # exact oracle (bbox-prefiltered pairs)
    """RIPLEY'S K pieces for the probe point pattern — THE spatial
    point-pattern statistic (complete-spatial-randomness test:
    clustering inflates K(r), inhibition deflates it): exact pair
    counts within r ∈ {512, 1024, 2048} over every 16th order's points
    (K̂(r) = area·n_pairs·2/n² is the caller's fold). Engine: the
    subsampled point set broadcasts once (`ray.put`) and every batch
    counts its pairs against it with a bbox prefilter + exact dist² —
    the `spatial_join_pairs` broadcast shape, so the count distributes
    over the probe side; oracle: the same bbox-prefiltered self-join
    (cell logic exact because box ≥ r). Emits (r, n_pairs) + n_points
    on each row."""
    pts = conflation.read_points(sf_dir)

    def _sub(batch: pa.Table) -> pa.Table:
        pid = batch["point_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = pid % 16 == 0
        return pa.table({
            "pid": pid[keep],
            "px": batch["px"].to_numpy(zero_copy_only=False)
            .astype(np.int64)[keep],
            "py": batch["py"].to_numpy(zero_copy_only=False)
            .astype(np.int64)[keep]})

    sub = pts.map_batches(_sub, batch_format="pyarrow", batch_size=8192)
    ref = sub.to_pandas()  # subsample-bounded broadcast side
    n_pts = len(ref)
    ref_ref = ray.put((ref["pid"].to_numpy(np.int64),
                       ref["px"].to_numpy(np.int64),
                       ref["py"].to_numpy(np.int64)))
    radii = (512, 1024, 2048)

    def _count(batch: pa.Table) -> pa.Table:
        from ..stages.util import cached_state

        rid, rx, ry = cached_state(ref_ref, lambda t: t, token="ripley.ref")
        pid = batch["pid"].to_numpy(zero_copy_only=False)
        px = batch["px"].to_numpy(zero_copy_only=False)
        py = batch["py"].to_numpy(zero_copy_only=False)
        order = np.argsort(rx, kind="mergesort")
        rxs, rys, rids = rx[order], ry[order], rid[order]
        counts = np.zeros(len(radii), np.int64)
        for i in range(len(pid)):
            lo = np.searchsorted(rxs, px[i] - 2048)
            hi = np.searchsorted(rxs, px[i] + 2048, side="right")
            dx = rxs[lo:hi] - px[i]
            dy = rys[lo:hi] - py[i]
            m = (np.abs(dy) <= 2048) & (rids[lo:hi] > pid[i])
            d2 = dx[m] * dx[m] + dy[m] * dy[m]
            for k, r in enumerate(radii):
                counts[k] += int((d2 <= r * r).sum())
        return pa.table({"r": np.array(radii, np.int64), "c": counts})

    parts = sub.map_batches(_count, batch_format="pyarrow",
                            batch_size=8192).to_pandas()
    agg = parts.groupby("r", as_index=False)["c"].sum()
    return pd.DataFrame({"r": agg["r"].to_numpy(np.int64),
                         "n_pairs": agg["c"].to_numpy(np.int64),
                         "n_points": np.int64(n_pts)})


SQL_GRID_RIPLEY_K = _CTES + """,
sub AS (
  SELECT point_id AS pid, px, py FROM points WHERE point_id % 16 = 0
),
rr(r) AS (VALUES (512), (1024), (2048)),
pc AS (
  SELECT rr.r, COUNT(*) AS n_pairs
  FROM sub a
  JOIN sub b ON b.pid > a.pid
            AND ABS(b.px - a.px) <= 2048 AND ABS(b.py - a.py) <= 2048
  JOIN rr ON (b.px - a.px) * (b.px - a.px)
             + (b.py - a.py) * (b.py - a.py) <= rr.r * rr.r
  GROUP BY rr.r
)
SELECT rr.r, CAST(COALESCE(pc.n_pairs, 0) AS BIGINT) AS n_pairs,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM sub) AS n_points
FROM rr LEFT JOIN pc ON pc.r = rr.r
"""


def q_supplier_chao1(sf_dir: str):  # exact oracle (abundance classes)
    """CHAO1 RICHNESS pieces per supplier — the unseen-species estimator
    of ecology, reused everywhere from vocabulary-size to dedup-coverage
    estimation ("how many part numbers does this supplier REALLY carry
    given what we sampled"): S_obs = distinct parts observed, f1 =
    singletons, f2 = doubletons; Chao1 = S_obs + f1²/(2f2) is the
    caller's rational fold. Two-level combiner: (supplier, part) counts
    then abundance-class rollup — nothing but group shuffles."""
    li = _rp(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])
    pairs = rel.partial_groupby_sum(li, ["l_suppkey", "l_partkey"], [],
                                    count_as="c",
                                    est_rows=_nrows(sf_dir, "lineitem"))

    def _classes(df: pd.DataFrame) -> pd.DataFrame:
        c = df["c"].to_numpy(np.int64)
        g = df.assign(one=(c == 1).astype(np.int64),
                      two=(c == 2).astype(np.int64)).groupby(
            "l_suppkey", as_index=False).agg(
            s_obs=("c", "size"), f1=("one", "sum"), f2=("two", "sum"))
        return g.astype(np.int64)

    return rel.bucketed_groups(pairs, ["l_suppkey"], _classes)


SQL_SUPPLIER_CHAO1 = """
WITH pc AS (
  SELECT l_suppkey, l_partkey, COUNT(*) AS c
  FROM lineitem GROUP BY 1, 2
)
SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS s_obs,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
       CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
FROM pc GROUP BY l_suppkey
"""


_RAKE_STOP = ("the", "a", "an", "of", "and", "to", "in", "is", "on",
              "for", "with", "as", "by", "at", "or")


def q_doc_rake_keyphrases(sf_dir: str):  # exact oracle (runs + word join)
    """RAKE-lite KEYPHRASE EXTRACTION over the corpus — the classic
    unsupervised keyword miner: candidate phrases are maximal
    stopword-free word runs (runs longer than 3 drop), word degree =
    Σ length of the runs it appears in, word frequency = its run
    occurrences, and a phrase ranks by the integer quotient
    score_q = (Σ deg)·10⁶ // (Σ freq) (the ratio-of-sums variant keeps
    the whole pipeline division-free and the ordering deterministic;
    ties → phrase asc). Emits the global top 20
    (phrase, n_occur, score_q). Engine: per-doc run extraction, one
    (word) combiner, broadcast word table, phrase scoring + k×B-bounded
    top-k; oracle: gaps-and-islands run ids + string_agg + word joins."""
    from ..functions.text import _WORD_ASCII_RE
    from ..stages.relational import bucketed_groups

    docs = _rp(sf_dir, "documents", ["doc_id", "text"])
    stop = set(_RAKE_STOP)

    def _runs(batch: pa.Table) -> pa.Table:
        ids_out, phrases, words_flat, plens = [], [], [], []
        for did, text in zip(
                batch["doc_id"].to_numpy(zero_copy_only=False),
                batch["text"].to_pylist()):
            ws = _WORD_ASCII_RE.findall((text or "").lower())
            run: list[str] = []
            for w in ws + [None]:
                if w is not None and w not in stop:
                    run.append(w)
                    continue
                if run and len(run) <= 3:
                    ids_out.append(int(did))
                    phrases.append(" ".join(run))
                    words_flat.append(list(run))
                    plens.append(len(run))
                run = []
        return pa.table({
            "doc_id": pa.array(ids_out, type=pa.int64()),
            "phrase": pa.array(phrases, type=pa.string()),
            "words": pa.array(words_flat, type=pa.list_(pa.string())),
            "plen": pa.array(plens, type=pa.int64())})

    runs = docs.map_batches(_runs, batch_format="pyarrow",
                            batch_size=2048).materialize()

    def _words(batch: pa.Table) -> pa.Table:
        ws, degs = [], []
        for lst, pl in zip(batch["words"].to_pylist(),
                           batch["plen"].to_numpy(zero_copy_only=False)):
            ws.extend(lst)
            degs.extend([int(pl)] * len(lst))
        return pa.table({"word": pa.array(ws, type=pa.string()),
                         "deg": pa.array(degs, type=pa.int64())})

    wstats = rel.partial_groupby_sum(
        runs.map_batches(_words, batch_format="pyarrow", batch_size=2048),
        ["word"], ["deg"], count_as="freq",
        est_rows=_nrows(sf_dir, "documents"))
    wdf = wstats.to_pandas()  # vocab-bounded
    deg_of = dict(zip(wdf["word"], wdf["deg"].astype(np.int64)))
    freq_of = dict(zip(wdf["word"], wdf["freq"].astype(np.int64)))
    ref = ray.put((deg_of, freq_of))

    def _score(batch: pa.Table) -> pa.Table:
        from ..stages.util import cached_state

        deg_map, freq_map = cached_state(ref, lambda t: t, token="rake.ws")
        sd, sf2 = [], []
        for lst in batch["words"].to_pylist():
            sd.append(sum(int(deg_map[w]) for w in lst))
            sf2.append(sum(int(freq_map[w]) for w in lst))
        return pa.table({"phrase": batch["phrase"],
                         "sumdeg": pa.array(sd, type=pa.int64()),
                         "sumfreq": pa.array(sf2, type=pa.int64())})

    scored = runs.map_batches(_score, batch_format="pyarrow",
                              batch_size=2048)

    def _agg(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("phrase", as_index=False).agg(
            n_occur=("sumdeg", "size"), sumdeg=("sumdeg", "max"),
            sumfreq=("sumfreq", "max"))
        g["score_q"] = (g["sumdeg"].astype(np.int64) * 1000000
                        // g["sumfreq"].astype(np.int64))
        return g[["phrase", "n_occur", "score_q"]]

    allp = bucketed_groups(scored, ["phrase"], _agg).to_pandas()
    allp = allp.sort_values(["score_q", "phrase"],
                            ascending=[False, True],
                            kind="mergesort").head(20)
    allp["n_occur"] = allp["n_occur"].astype(np.int64)
    return allp.reset_index(drop=True)


SQL_DOC_RAKE_KEYPHRASES = """
WITH toks AS (
  SELECT doc_id, j, w[j] AS word,
         w[j] IN ('{stops}') AS is_stop
  FROM (SELECT doc_id,
               regexp_extract_all(lower(text), '[0-9a-z_]+') AS w
        FROM documents),
       (SELECT unnest(range(1, 200)) AS j) js
  WHERE j <= len(w)
),
nr AS (
  SELECT doc_id, j, word,
         j - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY j) AS grp
  FROM toks WHERE NOT is_stop
),
ph AS (
  SELECT doc_id, grp, string_agg(word, ' ' ORDER BY j) AS phrase,
         COUNT(*) AS plen
  FROM nr GROUP BY doc_id, grp HAVING COUNT(*) <= 3
),
pw AS (
  SELECT nr.doc_id, nr.grp, nr.word, ph.phrase, ph.plen
  FROM nr JOIN ph ON ph.doc_id = nr.doc_id AND ph.grp = nr.grp
),
ws AS (
  SELECT word, COUNT(*) AS freq, SUM(plen) AS deg FROM pw GROUP BY word
),
phw AS (
  SELECT pw.doc_id, pw.grp, pw.phrase,
         SUM(ws.deg) AS sumdeg, SUM(ws.freq) AS sumfreq
  FROM pw JOIN ws ON ws.word = pw.word
  GROUP BY pw.doc_id, pw.grp, pw.phrase
),
sc AS (
  SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occur,
         MAX(sumdeg) * 1000000 // MAX(sumfreq) AS score_q
  FROM phw GROUP BY phrase
)
SELECT phrase, n_occur, CAST(score_q AS BIGINT) AS score_q
FROM sc ORDER BY score_q DESC, phrase LIMIT 20
""".format(stops="', '".join(_RAKE_STOP))


def q_image_template_match(sf_dir: str):  # exact oracle (separable SSD)
    """SSD TEMPLATE MATCHING through the decode path
    (``media.image_template_match``): best 8×8 window position ×
    template over a 4-template separable integer bank (ties by
    (ssd, k, y, x)) — the registration/detection primitive behind
    alignment and logo/watermark search. On the factorized fixture both
    image and templates are separable, so SSD(y,x,k) = 8ΣA² + 8ΣB² +
    2ΣA·ΣB with 1-D window residuals A (columns vs ta_k) and B (rows vs
    tb_k); the oracle enumerates the small (x,k) × (y,k) grids and
    picks the ROW_NUMBER argmin."""
    docs = _rp(sf_dir, "documents", ["doc_id"])

    synth = docs.map_batches(_image_fixture_synth, batch_format="pyarrow", batch_size=512)
    return mstage.image_template_match(synth, batch_size=512)


SQL_IMAGE_TEMPLATE_MATCH = """
WITH im AS (
  SELECT doc_id AS image_id,
         16 + (doc_id % 4) * 8 AS w, 12 + (doc_id % 3) * 6 AS h,
         doc_id % 3 AS fi,
         (doc_id * 7) % 200 AS br, (doc_id * 11) % 200 AS bg,
         CASE WHEN doc_id % 3 = 2
              THEN (((doc_id * 3) % 200) // 4) * 4
                   + (((doc_id * 3) % 200) // 4) // 16
              ELSE (doc_id * 3) % 200 END AS vb
  FROM documents
),
tk(k, alpha, beta) AS (VALUES (0, 5, 3), (1, 11, 7), (2, 17, 13),
                              (3, 23, 19)),
rq AS (
  SELECT image_id, j, vb,
         CASE WHEN fi = 2
              THEN ((br + (j * 55) // (w - 1)) // 4) * 4
                   + ((br + (j * 55) // (w - 1)) // 4) // 16
              ELSE br + (j * 55) // (w - 1) END AS vr
  FROM im, (SELECT unnest(range(40)) AS j) js WHERE j < w
),
acs AS (
  SELECT rq.image_id, rq.j - o.o + 1 AS x, tk.k,
         SUM(rq.vr + rq.vb - (o.o * tk.alpha) % 64) AS sa,
         SUM((rq.vr + rq.vb - (o.o * tk.alpha) % 64)
             * (rq.vr + rq.vb - (o.o * tk.alpha) % 64)) AS qa
  FROM rq
  CROSS JOIN (SELECT unnest(range(1, 9)) AS o) o
  CROSS JOIN tk
  WHERE rq.j - o.o + 1 >= 0
  GROUP BY 1, 2, 3 HAVING COUNT(*) = 8
),
gq AS (
  SELECT image_id, r,
         CASE WHEN fi = 2
              THEN ((bg + (r * 41) // (h - 1)) // 4) * 4
                   + ((bg + (r * 41) // (h - 1)) // 4) // 16
              ELSE bg + (r * 41) // (h - 1) END AS vg
  FROM im, (SELECT unnest(range(24)) AS r) rs2 WHERE r < h
),
bcs AS (
  SELECT gq.image_id, gq.r - o.o + 1 AS y, tk.k,
         SUM(gq.vg - (o.o * tk.beta) % 64) AS sb,
         SUM((gq.vg - (o.o * tk.beta) % 64)
             * (gq.vg - (o.o * tk.beta) % 64)) AS qb
  FROM gq
  CROSS JOIN (SELECT unnest(range(1, 9)) AS o) o
  CROSS JOIN tk
  WHERE gq.r - o.o + 1 >= 0
  GROUP BY 1, 2, 3 HAVING COUNT(*) = 8
),
ssd AS (
  SELECT a.image_id, a.k, b.y, a.x,
         8 * a.qa + 8 * b.qb + 2 * a.sa * b.sb AS v,
         ROW_NUMBER() OVER (PARTITION BY a.image_id
                            ORDER BY 8 * a.qa + 8 * b.qb + 2 * a.sa * b.sb,
                                     a.k, b.y, a.x) AS rn
  FROM acs a JOIN bcs b ON b.image_id = a.image_id AND b.k = a.k
)
SELECT image_id, CAST(k AS BIGINT) AS best_k, CAST(y AS BIGINT) AS best_y,
       CAST(x AS BIGINT) AS best_x, CAST(v AS BIGINT) AS best_ssd
FROM ssd WHERE rn = 1
"""


def q_events_ccf_pieces(sf_dir: str):  # exact oracle (lagged day join)
    """CROSS-CORRELATION FUNCTION pieces between the 'click' and 'view'
    daily cents series at lags −3..3 — the lead/lag discovery tool of
    time-series analysis ("do clicks lead views?"): per lag, the exact
    overlap moments (n, Σx, Σy, Σxy, Σx², Σy²) over days where BOTH
    series exist at offset; Pearson r per lag is the caller's fold. One
    (type, day) combiner; the lag joins run on the day-bounded table."""
    ev = _rp(sf_dir, "events", ["event_type", "ts", "value"])

    def _day(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": df["event_type"].astype(str),
            "day": df["ts"].astype("int64").to_numpy() // 86_400_000_000,
            "vc": cents(df["value"].to_numpy())})

    daily = rel.partial_groupby_sum(
        ev.map_batches(_day, batch_format="pandas", batch_size=8192),
        ["event_type", "day"], ["vc"], est_rows=_nrows(sf_dir, "events"))
    df = daily.to_pandas()
    df["vd"] = df["vc"].astype(np.int64) // 100  # divide AFTER the day sum
    a = df[df["event_type"] == "click"].set_index("day")["vd"]
    b = df[df["event_type"] == "view"].set_index("day")["vd"]
    rows = []
    for lag in range(-3, 4):
        bb = b.copy()
        bb.index = bb.index + lag
        j = pd.concat([a, bb], axis=1, join="inner", keys=["x", "y"])
        x = j["x"].to_numpy(np.int64)
        y = j["y"].to_numpy(np.int64)
        rows.append({"lag": lag, "n": len(j),
                     "sx": int(x.sum()), "sy": int(y.sum()),
                     "sxy": int((x * y).sum()),
                     "sxx": int((x * x).sum()),
                     "syy": int((y * y).sum())})
    return pd.DataFrame(rows).astype(np.int64)


SQL_EVENTS_CCF_PIECES = """
WITH daily AS (
  SELECT event_type,
         CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day,
         SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) // 100 AS vd
  FROM events WHERE event_type IN ('click', 'view')
  GROUP BY 1, 2
),
a AS (SELECT day, vd AS x FROM daily WHERE event_type = 'click'),
b AS (SELECT day, vd AS y FROM daily WHERE event_type = 'view'),
lags(lag) AS (VALUES (-3), (-2), (-1), (0), (1), (2), (3))
SELECT l.lag, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(a.x) AS BIGINT) AS sx, CAST(SUM(b.y) AS BIGINT) AS sy,
       CAST(SUM(a.x * b.y) AS BIGINT) AS sxy,
       CAST(SUM(a.x * a.x) AS BIGINT) AS sxx,
       CAST(SUM(b.y * b.y) AS BIGINT) AS syy
FROM lags l
JOIN a ON TRUE
JOIN b ON b.day + l.lag = a.day
GROUP BY l.lag
"""


def q_part_holt_winters(sf_dir: str):  # exact oracle (state-replay CTE)
    """ADDITIVE HOLT–WINTERS per part (every 8th) over the 12 monthly
    quantity sums, season length 4 — the seasonality-aware upgrade of
    `part_demand_holt`'s double smoothing, in exact truncating
    fixed-point (the SQL ``//`` semantics): forecast f = l + t + s[m%4];
    error e = x − f; then l += (l+t) update with e//4, t += e//16,
    s[m%4] += e//8 (gains ¼, 1/16, ⅛). Seasonals initialize from the
    first season's deviations about the first value. Emits per part
    (l_fin, t_fin, sse) with sse = Σe² the one-step-ahead fit. Engine:
    one (part, month) combiner + per-part replay; oracle: the monthly
    LIST + the 4-slot seasonal LIST replayed one month per recursive
    round."""
    li = _rp(sf_dir, "lineitem", ["l_partkey", "l_shipdate", "l_quantity"])

    def _prep(batch: pa.Table) -> pa.Table:
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = pk % 8 == 0
        sub = batch.filter(pa.array(keep))
        ts = sub["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        mo = (ts.astype("datetime64[us]").astype("datetime64[M]")
              .astype(np.int64) % 12 + 1)
        return pa.table({"l_partkey": pk[keep], "mo": mo,
                         "d": cents(sub["l_quantity"]
                                    .to_numpy(zero_copy_only=False), 1)})

    prep = li.map_batches(_prep, batch_format="pyarrow", batch_size=8192)
    sums = rel.partial_groupby_sum(prep, ["l_partkey", "mo"], ["d"],
                                   est_rows=_nrows(sf_dir, "lineitem"))
    df = sums.to_pandas()
    piv = df.pivot_table(index="l_partkey", columns="mo", values="d",
                         aggfunc="sum", fill_value=0)
    piv = piv.reindex(columns=range(1, 13), fill_value=0).astype(np.int64)

    def _tdiv(a: int, b: int) -> int:
        return -((-a) // b) if a < 0 else a // b

    rows = []
    for pk2, row in piv.iterrows():
        x = [int(v) for v in row.to_numpy(np.int64)]
        lev, tr = x[0], 0
        s = [x[m] - x[0] for m in range(4)]
        sse = 0
        for m in range(12):
            f = lev + tr + s[m % 4]
            e = x[m] - f
            sse += e * e
            new_lev = lev + tr + _tdiv(e, 4)
            tr = tr + _tdiv(e, 16)
            s[m % 4] = s[m % 4] + _tdiv(e, 8)
            lev = new_lev
        rows.append({"l_partkey": int(pk2), "l_fin": lev, "t_fin": tr,
                     "sse": sse})
    return pd.DataFrame(rows)


SQL_PART_HOLT_WINTERS = """
WITH RECURSIVE dm AS (
  SELECT l_partkey, CAST(EXTRACT(month FROM l_shipdate) AS BIGINT) AS mo,
         SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS d
  FROM lineitem WHERE l_partkey % 8 = 0
  GROUP BY 1, 2
),
grid AS (
  SELECT p.l_partkey, mm.mo, COALESCE(dm.d, 0) AS d
  FROM (SELECT DISTINCT l_partkey FROM dm) p
  CROSS JOIN (SELECT unnest(range(1, 13)) AS mo) mm
  LEFT JOIN dm ON dm.l_partkey = p.l_partkey AND dm.mo = mm.mo
),
lst AS (
  SELECT l_partkey, list(d ORDER BY mo) AS xs FROM grid GROUP BY l_partkey
),
hw AS (
  SELECT l_partkey, xs, 0 AS m, xs[1] AS lev, CAST(0 AS BIGINT) AS tr,
         [xs[1] - xs[1], xs[2] - xs[1], xs[3] - xs[1], xs[4] - xs[1]] AS s,
         CAST(0 AS BIGINT) AS sse
  FROM lst
  UNION ALL
  SELECT l_partkey, xs, m + 1,
         lev + tr + e // 4,
         tr + e // 16,
         list_transform(range(1, 5),
           i -> CASE WHEN i = m % 4 + 1 THEN s[i] + e // 8 ELSE s[i] END),
         sse + e * e
  FROM (
    SELECT *, xs[m + 1] - (lev + tr + s[m % 4 + 1]) AS e
    FROM hw WHERE m < 12
  )
)
SELECT l_partkey, CAST(lev AS BIGINT) AS l_fin, CAST(tr AS BIGINT) AS t_fin,
       CAST(sse AS BIGINT) AS sse
FROM hw WHERE m = 12
"""


def q_part_abc_migration(sf_dir: str):  # exact oracle (dual-year ranks)
    """ABC CLASS MIGRATION matrix 1995 → 1996 — the inventory-management
    churn report on top of `part_abc_classes`' static cut: per year,
    parts rank by revenue cents (desc, tie partkey) and class by exact
    cumulative share (A: cum·100 ≤ 80·total, B: ≤ 95, else C, evaluated
    AFTER adding the part); the matrix counts parts per (class_1995,
    class_1996) over parts present in both years — "which A-movers
    slipped to C" is the planner's question. One (part, year) combiner;
    ranks on the parts-bounded table. Emits (c95, c96, n_parts)."""
    li = _rp(sf_dir, "lineitem", ["l_partkey", "l_shipdate",
                                  "l_extendedprice"])

    def _prep(batch: pa.Table) -> pa.Table:
        ts = batch["l_shipdate"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        yr = (ts.astype("datetime64[us]").astype("datetime64[Y]")
              .astype(np.int64) + 1970)
        keep = (yr == 1995) | (yr == 1996)
        return pa.table({
            "l_partkey": batch["l_partkey"].cast(pa.int64())
            .filter(pa.array(keep)),
            "yr": yr[keep],
            "rev": cents(batch["l_extendedprice"]
                         .to_numpy(zero_copy_only=False))[keep]})

    prep = li.map_batches(_prep, batch_format="pyarrow", batch_size=8192)
    sums = rel.partial_groupby_sum(prep, ["l_partkey", "yr"], ["rev"],
                                   est_rows=_nrows(sf_dir, "lineitem"))
    df = sums.to_pandas()

    def classes(g: pd.DataFrame) -> pd.Series:
        d = g.sort_values(["rev", "l_partkey"], ascending=[False, True],
                          kind="mergesort")
        rev = d["rev"].to_numpy(np.int64)
        tot = int(rev.sum())
        cum = np.cumsum(rev)
        cls = np.where(cum * 100 <= 80 * tot, "A",
                       np.where(cum * 100 <= 95 * tot, "B", "C"))
        return pd.Series(cls, index=d["l_partkey"].to_numpy(np.int64))

    c95 = classes(df[df["yr"] == 1995])
    c96 = classes(df[df["yr"] == 1996])
    both = c95.index.intersection(c96.index)
    m = pd.DataFrame({"c95": c95.loc[both], "c96": c96.loc[both]})
    out = m.groupby(["c95", "c96"], as_index=False).size()
    out.columns = ["c95", "c96", "n_parts"]
    out["n_parts"] = out["n_parts"].astype(np.int64)
    return out


SQL_PART_ABC_MIGRATION = """
WITH py AS (
  SELECT l_partkey, CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS yr,
         SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS rev
  FROM lineitem
  WHERE EXTRACT(year FROM l_shipdate) IN (1995, 1996)
  GROUP BY 1, 2
),
rk AS (
  SELECT l_partkey, yr, rev,
         SUM(rev) OVER (PARTITION BY yr ORDER BY rev DESC, l_partkey
                        ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(rev) OVER (PARTITION BY yr) AS tot
  FROM py
),
cl AS (
  SELECT l_partkey, yr,
         CASE WHEN cum * 100 <= 80 * tot THEN 'A'
              WHEN cum * 100 <= 95 * tot THEN 'B'
              ELSE 'C' END AS cls
  FROM rk
)
SELECT a.cls AS c95, b.cls AS c96, CAST(COUNT(*) AS BIGINT) AS n_parts
FROM cl a JOIN cl b ON b.l_partkey = a.l_partkey
WHERE a.yr = 1995 AND b.yr = 1996
GROUP BY 1, 2
"""


def q_events_sax_symbols(sf_dir: str):  # exact oracle (rank breakpoints)
    """SAX SYMBOLIZATION per event type — the time-series indexing
    classic (PAA + alphabet quantization, here in exact integers): daily
    cents sums aggregate into 4-day PAA windows (wsum over present
    days); per type the three breakpoints are the order statistics at
    ranks ⌈k·n/4⌉ of the (wsum, win)-sorted window list, and a window's
    symbol counts breakpoints STRICTLY below its wsum (alphabet 0-3).
    Emits (event_type, win, wsum, sym) — the discretized series that
    SAX-based motif/novelty search indexes. One (type, window) combiner;
    breakpoints + symbols on the window-bounded table."""
    ev = _rp(sf_dir, "events", ["event_type", "ts", "value"])

    def _win(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": df["event_type"].astype(str),
            "win": (df["ts"].astype("int64").to_numpy()
                    // 86_400_000_000) // 4,
            "vc": cents(df["value"].to_numpy())})

    wins = rel.partial_groupby_sum(
        ev.map_batches(_win, batch_format="pandas", batch_size=8192),
        ["event_type", "win"], ["vc"], est_rows=_nrows(sf_dir, "events"))
    df = wins.to_pandas()
    rows = []
    for et, g in df.groupby("event_type"):
        w = g["win"].to_numpy(np.int64)
        s = g["vc"].to_numpy(np.int64)
        n = len(g)
        order = np.lexsort((w, s))
        bks = [int(s[order[int(-(-(k * n) // 4)) - 1]]) for k in (1, 2, 3)]
        sym = np.zeros(n, np.int64)
        for b in bks:
            sym += (s > b).astype(np.int64)
        for i in range(n):
            rows.append({"event_type": str(et), "win": int(w[i]),
                         "wsum": int(s[i]), "sym": int(sym[i])})
    return pd.DataFrame(rows)


SQL_EVENTS_SAX_SYMBOLS = """
WITH wins AS (
  SELECT event_type,
         (CAST(epoch_us(ts) AS BIGINT) // 86400000000) // 4 AS win,
         SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS wsum
  FROM events GROUP BY 1, 2
),
rk AS (
  SELECT event_type, win, wsum,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY wsum, win) AS i,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM wins
),
bks AS (
  SELECT r.event_type, k.k, MAX(r.wsum) AS b
  FROM rk r JOIN (SELECT unnest([1, 2, 3]) AS k) k
    ON r.i = (k.k * r.n + 3) // 4
  GROUP BY r.event_type, k.k
)
SELECT w.event_type, CAST(w.win AS BIGINT) AS win,
       CAST(w.wsum AS BIGINT) AS wsum,
       CAST(SUM(CASE WHEN w.wsum > bks.b THEN 1 ELSE 0 END) AS BIGINT)
         AS sym
FROM wins w JOIN bks ON bks.event_type = w.event_type
GROUP BY w.event_type, w.win, w.wsum
"""


def q_supplier_friedman_pieces(sf_dir: str):  # exact oracle (block ranks)
    """FRIEDMAN TEST pieces — the blocked nonparametric ANOVA that
    completes the suite (Mann-Whitney, KS, runs, Mann-Kendall, χ²):
    blocks = suppliers, treatments = the 4 ship-quarters, observations =
    quarterly quantity sums; within each block the quarters take DOUBLED
    midranks (ties exact in integers: rank2 = 2·#{less} + #{equal} + 1),
    and the output is the per-quarter rank2 sum plus the block count —
    the Friedman χ²_F statistic is the caller's rational fold. One
    (supplier, quarter) combiner; ranks on the suppliers×4-bounded
    table. Emits (qtr, r2_sum, n_blocks)."""
    li = _rp(sf_dir, "lineitem", ["l_suppkey", "l_shipdate", "l_quantity"])

    def _prep(batch: pa.Table) -> pa.Table:
        ts = batch["l_shipdate"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        mo = (ts.astype("datetime64[us]").astype("datetime64[M]")
              .astype(np.int64) % 12)
        return pa.table({
            "l_suppkey": batch["l_suppkey"].cast(pa.int64()),
            "qtr": mo // 3 + 1,
            "d": cents(batch["l_quantity"].to_numpy(zero_copy_only=False),
                       1)})

    prep = li.map_batches(_prep, batch_format="pyarrow", batch_size=8192)
    sums = rel.partial_groupby_sum(prep, ["l_suppkey", "qtr"], ["d"],
                                   est_rows=_nrows(sf_dir, "lineitem"))
    df = sums.to_pandas()
    piv = df.pivot_table(index="l_suppkey", columns="qtr", values="d",
                         aggfunc="sum", fill_value=0)
    piv = piv.reindex(columns=range(1, 5), fill_value=0).astype(np.int64)
    vals = piv.to_numpy(np.int64)
    # doubled midranks within each block, exact under ties
    less = (vals[:, :, None] > vals[:, None, :]).sum(axis=2)
    equal = (vals[:, :, None] == vals[:, None, :]).sum(axis=2)
    rank2 = 2 * less + equal + 1
    return pd.DataFrame({"qtr": np.arange(1, 5, dtype=np.int64),
                         "r2_sum": rank2.sum(axis=0).astype(np.int64),
                         "n_blocks": np.int64(len(piv))})


SQL_SUPPLIER_FRIEDMAN_PIECES = """
WITH qm AS (
  SELECT l_suppkey,
         (CAST(EXTRACT(month FROM l_shipdate) AS BIGINT) - 1) // 3 + 1
           AS qtr,
         SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS d
  FROM lineitem GROUP BY 1, 2
),
grid AS (
  SELECT s.l_suppkey, q.qtr, COALESCE(qm.d, 0) AS d
  FROM (SELECT DISTINCT l_suppkey FROM qm) s
  CROSS JOIN (SELECT unnest(range(1, 5)) AS qtr) q
  LEFT JOIN qm ON qm.l_suppkey = s.l_suppkey AND qm.qtr = q.qtr
),
rk AS (
  SELECT a.l_suppkey, a.qtr,
         2 * SUM(CASE WHEN b.d < a.d THEN 1 ELSE 0 END)
         + SUM(CASE WHEN b.d = a.d THEN 1 ELSE 0 END) + 2 AS rank2
  FROM grid a JOIN grid b
    ON b.l_suppkey = a.l_suppkey AND b.qtr <> a.qtr
  GROUP BY a.l_suppkey, a.qtr
)
SELECT qtr, CAST(SUM(rank2) AS BIGINT) AS r2_sum,
       (SELECT CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) FROM qm)
         AS n_blocks
FROM rk GROUP BY qtr
"""


def q_grid_sandpile_rounds(sf_dir: str):  # exact oracle (5-way fan-out)
    """ABELIAN SANDPILE toppling over the density raster (the
    self-organized-criticality CA, the QUANTITY-transport sibling of
    `grid_life_rounds`' boolean rule): grains = point counts per cell
    scaled down (v // 8 keeps round counts interesting); each synchronous
    round every cell with ≥ 4 grains topples, losing 4 and sending 1 to
    each von-Neumann neighbor (off-raster grains are LOST — the open
    boundary of the classic model); 3 rounds. Emits per round
    (round, n_unstable, total_grains, chk) with the Σ(31cx+17cy·grains)
    checksum pinning the distribution. Grid-bounded shift rounds; oracle
    unrolls each as a 5-way neighbor fan-out."""
    pts = conflation.read_points(sf_dir)
    from ..stages.relational import partial_groupby_sum

    def _cells_of(batch: pa.Table) -> pa.Table:
        x = batch["px"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch["py"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"cx": x // 1024, "cy": y // 1024})

    raw = pts.map_batches(_cells_of, batch_format="pyarrow", batch_size=8192)
    density = partial_groupby_sum(raw, ["cx", "cy"], [], count_as="v",
                                  est_rows=_nrows(sf_dir, "lineitem"))
    dtab = density.to_pandas()
    g = np.zeros((64, 64), np.int64)
    g[dtab["cy"].to_numpy(np.int64), dtab["cx"].to_numpy(np.int64)] = \
        dtab["v"].to_numpy(np.int64) // 8
    rows = []
    for r in range(4):
        cy, cx = np.nonzero(g)
        rows.append({"round": r, "n_unstable": int((g >= 4).sum()),
                     "total_grains": int(g.sum()),
                     "chk": int((g[cy, cx] * (31 * cx + 17 * cy)).sum())})
        if r == 3:
            break
        t = (g >= 4).astype(np.int64)
        new_g = g - 4 * t
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            sh = np.zeros((64, 64), np.int64)
            ys = slice(max(dy, 0), 64 + min(dy, 0))
            yd = slice(max(-dy, 0), 64 + min(-dy, 0))
            xs2 = slice(max(dx, 0), 64 + min(dx, 0))
            xd = slice(max(-dx, 0), 64 + min(-dx, 0))
            sh[ys, xs2] = t[yd, xd]
            new_g += sh
        g = new_g
    return pd.DataFrame(rows).astype(np.int64)


def _sand_round_sql(r: int) -> str:
    return f""",
g{r + 1} AS (
  SELECT g.cx, g.cy,
         g.v - 4 * (CASE WHEN g.v >= 4 THEN 1 ELSE 0 END)
         + COALESCE(t.inc, 0) AS v
  FROM g{r} g
  LEFT JOIN (
    SELECT n.cx + d.dx AS cx, n.cy + d.dy AS cy, COUNT(*) AS inc
    FROM g{r} n CROSS JOIN (VALUES (-1, 0), (1, 0), (0, -1), (0, 1))
      AS d(dx, dy)
    WHERE n.v >= 4
    GROUP BY 1, 2
  ) t ON t.cx = g.cx AND t.cy = g.cy
)"""


SQL_GRID_SANDPILE_ROUNDS = _CTES + """,
cells AS (
  SELECT px // 1024 AS cx, py // 1024 AS cy,
         CAST(COUNT(*) AS BIGINT) // 8 AS v
  FROM points GROUP BY px // 1024, py // 1024
),
g0 AS (
  SELECT gx.cx, gy.cy, COALESCE(c.v, 0) AS v
  FROM (SELECT unnest(range(64)) AS cx) gx
  CROSS JOIN (SELECT unnest(range(64)) AS cy) gy
  LEFT JOIN cells c ON c.cx = gx.cx AND c.cy = gy.cy
)""" + "".join(_sand_round_sql(r) for r in (0, 1, 2)) + """
SELECT r.round, s.n_unstable, s.total_grains, s.chk FROM (
  SELECT 0 AS round UNION ALL SELECT 1 UNION ALL SELECT 2
  UNION ALL SELECT 3) r
JOIN (
  SELECT 0 AS round,
         CAST(SUM(CASE WHEN v >= 4 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_unstable,
         CAST(SUM(v) AS BIGINT) AS total_grains,
         CAST(SUM(v * (31 * cx + 17 * cy)) AS BIGINT) AS chk FROM g0
  UNION ALL
  SELECT 1, CAST(SUM(CASE WHEN v >= 4 THEN 1 ELSE 0 END) AS BIGINT),
         CAST(SUM(v) AS BIGINT),
         CAST(SUM(v * (31 * cx + 17 * cy)) AS BIGINT) FROM g1
  UNION ALL
  SELECT 2, CAST(SUM(CASE WHEN v >= 4 THEN 1 ELSE 0 END) AS BIGINT),
         CAST(SUM(v) AS BIGINT),
         CAST(SUM(v * (31 * cx + 17 * cy)) AS BIGINT) FROM g2
  UNION ALL
  SELECT 3, CAST(SUM(CASE WHEN v >= 4 THEN 1 ELSE 0 END) AS BIGINT),
         CAST(SUM(v) AS BIGINT),
         CAST(SUM(v * (31 * cx + 17 * cy)) AS BIGINT) FROM g3
) s ON s.round = r.round
"""


def q_nation_rca_index(sf_dir: str):  # exact oracle (cross-mult shares)
    """REVEALED COMPARATIVE ADVANTAGE (Balassa index) pieces per
    (nation, part brand) — the trade-economics specialization screen:
    RCA = (x_nb/x_n)/(x_b/x_tot) > 1 iff the nation over-indexes on the
    brand; cross-multiplied exact as num = x_nb·x_tot, den = x_n·x_b.
    Emits one row per (n_name, p_brand) with (rev_c, num, den,
    rca_gt1). Combiner-first (nation, brand) rollup; margins join on
    the bounded rollup table; broadcast customer→nation and part→brand
    lookups on the fact scan."""
    li = _rp(sf_dir, "lineitem", ["l_orderkey", "l_partkey",
                                  "l_extendedprice"])
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    otab = pq.read_table(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_custkey"])
    o2c = dict(zip(otab["o_orderkey"].to_numpy().tolist(),
                   otab["o_custkey"].to_numpy().tolist()))
    c2n = dict(zip(cust["c_custkey"].to_numpy().tolist(),
                   cust["c_nationkey"].to_numpy().tolist()))
    p2b = dict(zip(part["p_partkey"].to_numpy().tolist(),
                   part["p_brand"].to_pylist()))
    n2name = dict(zip(nat["n_nationkey"].to_numpy().tolist(),
                      nat["n_name"].to_pylist()))
    refs = ray.put((o2c, c2n, p2b))

    def _nb(batch: pa.Table) -> pa.Table:
        from ..stages.util import cached_state

        o2c_m, c2n_m, p2b_m = cached_state(refs, lambda t: t,
                                           token="rca.maps")
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        nk = np.array([c2n_m[o2c_m[int(o)]] for o in ok], np.int64)
        brands = np.array([p2b_m[int(p)] for p in pk], dtype=object)
        return pa.table({
            "nk": nk, "p_brand": pa.array(list(brands), type=pa.string()),
            "rev": cents(batch["l_extendedprice"]
                         .to_numpy(zero_copy_only=False))})

    rolled = rel.partial_groupby_sum(
        li.map_batches(_nb, batch_format="pyarrow", batch_size=8192),
        ["nk", "p_brand"], ["rev"], est_rows=_nrows(sf_dir, "lineitem"))
    df = rolled.to_pandas()  # nations×brands-bounded
    # $10k units AFTER the rollup keep the cross-multiplications in
    # int64 at every scale (cents overflowed at sf0.01 — gate-caught)
    df["rev_u"] = df["rev"].astype(np.int64) // 1000000
    x_n = df.groupby("nk")["rev_u"].sum()
    x_b = df.groupby("p_brand")["rev_u"].sum()
    x_tot = int(df["rev_u"].sum())
    num = df["rev_u"].astype(np.int64) * x_tot
    den = (df["nk"].map(x_n).astype(np.int64)
           * df["p_brand"].map(x_b).astype(np.int64))
    return pd.DataFrame({
        "n_name": df["nk"].map(n2name),
        "p_brand": df["p_brand"],
        "rev_u": df["rev_u"].astype(np.int64),
        "num": num.astype(np.int64), "den": den.astype(np.int64),
        "rca_gt1": (num > den).astype(np.int64)})


SQL_NATION_RCA_INDEX = """
WITH nb AS (
  SELECT n.n_name, p.p_brand,
         SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS rev
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
),
m AS (
  SELECT n_name, p_brand, rev // 1000000 AS rev_u,
         SUM(rev // 1000000) OVER (PARTITION BY n_name) AS x_n,
         SUM(rev // 1000000) OVER (PARTITION BY p_brand) AS x_b,
         SUM(rev // 1000000) OVER () AS x_tot
  FROM nb
)
SELECT n_name, p_brand, CAST(rev_u AS BIGINT) AS rev_u,
       CAST(rev_u * x_tot AS BIGINT) AS num,
       CAST(x_n * x_b AS BIGINT) AS den,
       CAST(CASE WHEN rev_u * x_tot > x_n * x_b THEN 1 ELSE 0 END
            AS BIGINT) AS rca_gt1
FROM m
"""


def q_doc_porter_stems(sf_dir: str):  # exact oracle (suffix CASE ladder)
    """PORTER STEP-1a STEMMING + corpus top stems — the plural-collapse
    pass of the classic stemmer (sses→ss, ies→i, ss stays, trailing
    s drops) applied corpus-wide, then the top-20 stems by (count desc,
    stem asc) — the vocabulary-normalization primitive search indexes
    run before counting ("tables", "table" and "tabless-isms" aside
    collapse together where raw `doc_vocab` keeps them apart). Text
    never shuffles — (stem, n) partials ride the bucketed combine."""
    from ..functions.text import _WORD_ASCII_RE
    from ..stages.relational import bucketed_groups

    docs = _rp(sf_dir, "documents", ["text"])

    def _stem(w: str) -> str:
        if w.endswith("sses"):
            return w[:-2]
        if w.endswith("ies"):
            return w[:-2]
        if w.endswith("ss"):
            return w
        if w.endswith("s") and len(w) > 1:
            return w[:-1]
        return w

    def _pre(df: pd.DataFrame) -> pd.DataFrame:
        stems: list[str] = []
        for t in df["text"]:
            stems.extend(_stem(w)
                         for w in _WORD_ASCII_RE.findall((t or "").lower()))
        vc = pd.Series(stems, dtype=object).value_counts()
        return pd.DataFrame({"stem": vc.index.astype(object),
                             "n": vc.to_numpy().astype(np.int64)})

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("stem", as_index=False, sort=False)["n"].sum()
        return tot.sort_values(["n", "stem"], ascending=[False, True],
                               kind="mergesort").head(20)

    parts = bucketed_groups(docs, ["stem"], _final, pre_fn=_pre,
                            est_rows=_nrows(sf_dir, "documents"))
    out = parts.to_pandas().sort_values(["n", "stem"],
                                        ascending=[False, True],
                                        kind="mergesort").head(20)
    out["n"] = out["n"].astype(np.int64)
    return out.reset_index(drop=True)


SQL_DOC_PORTER_STEMS = """
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '[0-9a-z_]+')) AS w
  FROM documents
),
st AS (
  SELECT CASE
           WHEN w LIKE '%sses' THEN substr(w, 1, length(w) - 2)
           WHEN w LIKE '%ies' THEN substr(w, 1, length(w) - 2)
           WHEN w LIKE '%ss' THEN w
           WHEN w LIKE '%s' AND length(w) > 1
             THEN substr(w, 1, length(w) - 1)
           ELSE w END AS stem
  FROM toks
)
SELECT stem, CAST(COUNT(*) AS BIGINT) AS n
FROM st GROUP BY stem ORDER BY n DESC, stem LIMIT 20
"""


def q_part_eoq_discrete(sf_dir: str):  # exact oracle (adjacent-Q test)
    """DISCRETE ECONOMIC ORDER QUANTITY per part — THE inventory formula
    (EOQ = √(2KD/h)) solved exactly over integers without any square
    root: total cost f(Q) = (2KD + hQ²)/(2Q) is unimodal in Q, so the
    discrete optimum is the SMALLEST Q whose adjacent cross-multiplied
    test (2KD + h(Q+1)²)·Q ≥ (2KD + hQ²)·(Q+1) holds — order cost
    K = 500, holding h = 2, demand D = the part's annual quantity.
    Emits (l_partkey, d_total, q_star). One per-part combiner + a
    vectorized closed-loop epilogue; oracle: a Q-range cross join with
    the same adjacent test + MIN."""
    li = _rp(sf_dir, "lineitem", ["l_partkey", "l_quantity"])

    def _prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": batch["l_partkey"].cast(pa.int64()),
            "d": cents(batch["l_quantity"].to_numpy(zero_copy_only=False),
                       1)})

    prep = li.map_batches(_prep, batch_format="pyarrow", batch_size=8192)
    sums = rel.partial_groupby_sum(prep, ["l_partkey"], ["d"],
                                   est_rows=_nrows(sf_dir, "lineitem"))
    df = sums.to_pandas()
    d = df["d"].to_numpy(np.int64)
    big_k, h = 500, 2
    # smallest Q in [1, 4000] passing the adjacent unimodality test
    q = np.arange(1, 4001, dtype=np.int64)
    lhs = (2 * big_k * d[:, None] + h * (q + 1) ** 2) * q
    rhs = (2 * big_k * d[:, None] + h * q * q) * (q + 1)
    ok = lhs >= rhs
    q_star = np.where(ok.any(axis=1), q[np.argmax(ok, axis=1)], 4000)
    return pd.DataFrame({"l_partkey": df["l_partkey"].to_numpy(np.int64),
                         "d_total": d, "q_star": q_star.astype(np.int64)})


SQL_PART_EOQ_DISCRETE = """
WITH dm AS (
  SELECT l_partkey, SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS d
  FROM lineitem GROUP BY 1
),
qq AS (SELECT unnest(range(1, 4001)) AS q),
ok AS (
  SELECT dm.l_partkey, dm.d, qq.q
  FROM dm CROSS JOIN qq
  WHERE (2 * 500 * dm.d + 2 * (qq.q + 1) * (qq.q + 1)) * qq.q
        >= (2 * 500 * dm.d + 2 * qq.q * qq.q) * (qq.q + 1)
)
SELECT l_partkey, CAST(MAX(d) AS BIGINT) AS d_total,
       CAST(COALESCE(MIN(q), 4000) AS BIGINT) AS q_star
FROM ok GROUP BY l_partkey
"""


def q_events_bollinger_signals(sf_dir: str):  # exact oracle (ROWS window)
    """BOLLINGER-BAND SIGNALS per event type — the rolling sibling of
    `events_control_chart`'s static baseline: over the daily dollar
    series, a day signals iff it breaks ±2σ of the TRAILING 15-day
    window (exclusive of itself), cross-multiplied exact:
    (x − μ)² > 4σ² ⟺ (x·n − S)² > 4·(n·Q − S²) with (S, Q, n) the
    trailing window sums (windows shorter than 5 days stay quiet).
    Emits per type (n_days, n_signals, first_signal_day; −1 quiet).
    One (type, day) combiner + vectorized prefix-sum windows; oracle:
    ROWS BETWEEN 15 PRECEDING AND 1 PRECEDING."""
    ev = _rp(sf_dir, "events", ["event_type", "ts", "value"])

    def _day(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": df["event_type"].astype(str),
            "day": df["ts"].astype("int64").to_numpy() // 86_400_000_000,
            "vc": cents(df["value"].to_numpy())})

    daily = rel.partial_groupby_sum(
        ev.map_batches(_day, batch_format="pandas", batch_size=8192),
        ["event_type", "day"], ["vc"], est_rows=_nrows(sf_dir, "events"))
    df = daily.to_pandas()
    df["vd"] = df["vc"].astype(np.int64) // 100
    rows = []
    W = 15
    for et, g in df.groupby("event_type"):
        d = g.sort_values("day")
        days = d["day"].to_numpy(np.int64)
        x = d["vd"].to_numpy(np.int64)
        n = len(d)
        cs = np.concatenate([[0], np.cumsum(x)])
        cq = np.concatenate([[0], np.cumsum(x * x)])
        sigs = []
        for i in range(n):
            lo = max(0, i - W)
            nw = i - lo
            if nw < 5:
                continue
            s = int(cs[i] - cs[lo])
            qq = int(cq[i] - cq[lo])
            if (int(x[i]) * nw - s) ** 2 > 4 * (nw * qq - s * s):
                sigs.append(int(days[i]))
        rows.append({"event_type": str(et), "n_days": n,
                     "n_signals": len(sigs),
                     "first_signal_day": sigs[0] if sigs else -1})
    return pd.DataFrame(rows)


SQL_EVENTS_BOLLINGER_SIGNALS = """
WITH daily AS (
  SELECT event_type,
         CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day,
         SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) // 100 AS vd
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT event_type, day, vd,
         COUNT(*) OVER tw AS nw,
         SUM(vd) OVER tw AS s,
         SUM(vd * vd) OVER tw AS q
  FROM daily
  WINDOW tw AS (PARTITION BY event_type ORDER BY day
                ROWS BETWEEN 15 PRECEDING AND 1 PRECEDING)
),
sig AS (
  SELECT event_type, day,
         CASE WHEN nw >= 5
                   AND (vd * nw - s) * (vd * nw - s)
                       > 4 * (nw * q - s * s)
              THEN 1 ELSE 0 END AS o
  FROM w
)
SELECT s.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(s.o) AS BIGINT) AS n_signals,
       CAST(COALESCE(MIN(s.day) FILTER (s.o = 1), -1) AS BIGINT)
         AS first_signal_day
FROM sig s GROUP BY s.event_type
"""


def q_embedding_triplet_check(sf_dir: str):  # exact oracle (pair joins)
    """TRIPLET-LOSS VIOLATION audit — the metric-learning evaluation
    primitive ("is same-label closer than different-label by the
    margin?") in exact fixed-point integers: anchors = vec_id < 32;
    positive = the lowest-id SAME-label vector above the anchor,
    negative = the lowest-id DIFFERENT-label vector above the anchor;
    violation iff d²(a,p) + margin > d²(a,n) with margin = 10¹⁰
    (fixed-point² scale). Emits per anchor (anchor_id, pos_id, neg_id,
    d2_pos, d2_neg, violated) — the audit every embedding-quality
    report runs. Anchors bounded; corpus joins are id-rule lookups."""
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding", "label"])
    ids = emb["vec_id"].to_numpy().astype(np.int64)
    lab = emb["label"].to_numpy().astype(np.int64)
    mat = ann.quantize_fixed(np.stack(emb["embedding"].to_pylist())
                             .astype(np.float64))
    order = np.argsort(ids)
    ids, lab, mat = ids[order], lab[order], mat[order]
    rows = []
    margin = 10_000_000_000
    for ai in np.flatnonzero(ids < 32):
        a = int(ids[ai])
        same = np.flatnonzero((lab == lab[ai]) & (ids > a))
        diff = np.flatnonzero((lab != lab[ai]) & (ids > a))
        if not len(same) or not len(diff):
            continue
        pi, ni = int(same[0]), int(diff[0])
        dp = int(((mat[ai] - mat[pi]) ** 2).sum())
        dn = int(((mat[ai] - mat[ni]) ** 2).sum())
        rows.append({"anchor_id": a, "pos_id": int(ids[pi]),
                     "neg_id": int(ids[ni]), "d2_pos": dp, "d2_neg": dn,
                     "violated": int(dp + margin > dn)})
    return pd.DataFrame(rows)


SQL_EMBEDDING_TRIPLET_CHECK = """
WITH e AS ({emb}),
el AS (
  SELECT e.vec_id, e.qv, CAST(emb2.label AS BIGINT) AS label
  FROM e JOIN embeddings emb2 ON emb2.vec_id = e.vec_id
),
anchors AS (SELECT * FROM el WHERE vec_id < 32),
pos AS (
  SELECT a.vec_id AS anchor_id, MIN(o.vec_id) AS pos_id
  FROM anchors a JOIN el o
    ON o.label = a.label AND o.vec_id > a.vec_id
  GROUP BY a.vec_id
),
neg AS (
  SELECT a.vec_id AS anchor_id, MIN(o.vec_id) AS neg_id
  FROM anchors a JOIN el o
    ON o.label <> a.label AND o.vec_id > a.vec_id
  GROUP BY a.vec_id
),
d AS (
  SELECT a.vec_id AS anchor_id, p.pos_id, n.neg_id,
         CAST(list_dot_product(
           list_transform(a.qv, x -> CAST(x AS DOUBLE)),
           list_transform(a.qv, x -> CAST(x AS DOUBLE)))
           + list_dot_product(
           list_transform(ep.qv, x -> CAST(x AS DOUBLE)),
           list_transform(ep.qv, x -> CAST(x AS DOUBLE)))
           - 2 * list_dot_product(
           list_transform(a.qv, x -> CAST(x AS DOUBLE)),
           list_transform(ep.qv, x -> CAST(x AS DOUBLE))) AS BIGINT)
           AS d2_pos,
         CAST(list_dot_product(
           list_transform(a.qv, x -> CAST(x AS DOUBLE)),
           list_transform(a.qv, x -> CAST(x AS DOUBLE)))
           + list_dot_product(
           list_transform(en.qv, x -> CAST(x AS DOUBLE)),
           list_transform(en.qv, x -> CAST(x AS DOUBLE)))
           - 2 * list_dot_product(
           list_transform(a.qv, x -> CAST(x AS DOUBLE)),
           list_transform(en.qv, x -> CAST(x AS DOUBLE))) AS BIGINT)
           AS d2_neg
  FROM anchors a
  JOIN pos p ON p.anchor_id = a.vec_id
  JOIN neg n ON n.anchor_id = a.vec_id
  JOIN el ep ON ep.vec_id = p.pos_id
  JOIN el en ON en.vec_id = n.neg_id
)
SELECT anchor_id, pos_id, neg_id, d2_pos, d2_neg,
       CAST(CASE WHEN d2_pos + 10000000000 > d2_neg THEN 1 ELSE 0 END
            AS BIGINT) AS violated
FROM d
""".format(emb=_SQL_EMB_FIXED.format(src="embeddings"))


def q_image_rlsa_smear(sf_dir: str):  # exact oracle (1-D gap test)
    """HORIZONTAL RLSA (run-length smearing) through the decode path
    (``media.image_rlsa_smear``): background runs ≤ 4 between foreground
    pixels fill — the document-layout-analysis classic merging
    characters into words/lines before segmentation; edge gaps never
    fill. On the full-height R-parity stripe fixture every row is
    identical, so the oracle is a 1-D nearest-one gap test (next1 −
    prev1 ≤ 5) × h with closed-form row weights for the fill checksum."""
    docs = _rp(sf_dir, "documents", ["doc_id"])

    synth = docs.map_batches(_image_fixture_synth, batch_format="pyarrow", batch_size=512)
    return mstage.image_rlsa_smear(synth, batch_size=512)


SQL_IMAGE_RLSA_SMEAR = """
WITH im AS (
  SELECT doc_id AS image_id,
         16 + (doc_id % 4) * 8 AS w, 12 + (doc_id % 3) * 6 AS h,
         doc_id % 3 AS fi,
         (doc_id * 7) % 200 AS br
  FROM documents
),
rq AS (
  SELECT image_id, j, w, h,
         (CASE WHEN fi = 2
               THEN ((br + (j * 55) // (w - 1)) // 4) * 4
                    + ((br + (j * 55) // (w - 1)) // 4) // 16
               ELSE br + (j * 55) // (w - 1) END) % 2 AS m
  FROM im, (SELECT unnest(range(40)) AS j) js WHERE j < w
),
nb AS (
  SELECT image_id, j, h, m,
         MAX(CASE WHEN m = 1 THEN j END) OVER
           (PARTITION BY image_id ORDER BY j
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev1,
         MIN(CASE WHEN m = 1 THEN j END) OVER
           (PARTITION BY image_id ORDER BY j
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next1
  FROM rq
),
fgap AS (
  -- a zero fills iff ones exist on both sides and the whole gap between
  -- the nearest ones spans <= 4 zeros (next1 - prev1 <= 5)
  SELECT image_id, j, h FROM nb
  WHERE m = 0 AND prev1 IS NOT NULL AND next1 IS NOT NULL
    AND next1 - prev1 <= 5
),
agg AS (
  SELECT rq.image_id, MAX(rq.h) AS h, SUM(rq.m) AS ones
  FROM rq GROUP BY rq.image_id
)
SELECT a.image_id,
       CAST(a.h * a.ones AS BIGINT) AS n_mask,
       CAST(a.h * (a.ones + COALESCE(fc.nf, 0)) AS BIGINT) AS n_after,
       CAST(COALESCE(fc.wsum, 0) AS BIGINT) AS fill_chk
FROM agg a
LEFT JOIN (
  SELECT image_id, COUNT(*) AS nf,
         SUM(31 * j * h + 17 * h * (h - 1) // 2) AS wsum
  FROM fgap GROUP BY image_id
) fc ON fc.image_id = a.image_id
"""


def q_tile_hits_rounds(sf_dir: str):  # exact oracle (unrolled mutual joins)
    """HITS HUBS-AND-AUTHORITIES over the directed probe 2-NN graph
    (each depot points at its 2 nearest peers) — Kleinberg's mutual-
    reinforcement algorithm, the directed counterpart of
    `part_supplier_pagerank`: two synchronous rounds of a ← Σ_in h,
    h ← Σ_out a, renormalized after each round by x ← (x·1024)//max
    (truncating division, the `embedding_power_iteration` device, so
    six orders of growth stay in int64). Emits (tile_id, h2, a2).
    Dimension-sized graph build; rounds are bounded-table joins; oracle
    unrolls the two rounds with windowed maxima."""
    t = td.tiles_table(sf_dir)
    tid = t["tile_id"].to_numpy().astype(np.int64)
    cx = t["cx"].to_numpy().astype(np.int64)
    cy = t["cy"].to_numpy().astype(np.int64)
    pm = tid % 10 == 0
    tid, cx, cy = tid[pm], cx[pm], cy[pm]
    order = np.argsort(tid)
    tid, cx, cy = tid[order], cx[order], cy[order]
    n = len(tid)
    src_l, dst_l = [], []
    for i in range(n):  # dimension-sized
        d2 = (cx - cx[i]) ** 2 + (cy - cy[i]) ** 2
        cand = np.lexsort((tid, d2))
        cnt = 0
        for j in cand:
            if j == i:
                continue
            src_l.append(i)
            dst_l.append(int(j))
            cnt += 1
            if cnt == 2:
                break
    src = np.asarray(src_l, np.int64)
    dst = np.asarray(dst_l, np.int64)

    def _norm(x: np.ndarray) -> np.ndarray:
        m = max(int(x.max()), 1)
        return (x * 1024) // m  # non-negative -> floor == trunc

    h = np.ones(n, np.int64)
    a = np.zeros(n, np.int64)
    for _ in range(2):
        a = _norm(np.bincount(dst, weights=h[src].astype(np.float64),
                              minlength=n).astype(np.int64))
        h = _norm(np.bincount(src, weights=a[dst].astype(np.float64),
                              minlength=n).astype(np.int64))
    return pd.DataFrame({"tile_id": tid, "h2": h, "a2": a})


SQL_TILE_HITS_ROUNDS = f"""WITH tiles AS ({td.TILES_SQL}),
pn AS (SELECT tile_id, cx, cy FROM tiles WHERE tile_id % 10 = 0),
ed AS (
  SELECT s, t FROM (
    SELECT a.tile_id AS s, b.tile_id AS t,
           ROW_NUMBER() OVER (
             PARTITION BY a.tile_id
             ORDER BY (a.cx - b.cx) * (a.cx - b.cx)
                    + (a.cy - b.cy) * (a.cy - b.cy), b.tile_id) AS rn
    FROM pn a JOIN pn b ON b.tile_id <> a.tile_id
  ) WHERE rn <= 2
),
h0 AS (SELECT tile_id, CAST(1 AS BIGINT) AS h FROM pn),
a1r AS (
  SELECT p.tile_id, COALESCE(SUM(h0.h), 0) AS v
  FROM pn p LEFT JOIN ed ON ed.t = p.tile_id
  LEFT JOIN h0 ON h0.tile_id = ed.s
  GROUP BY p.tile_id
),
a1 AS (SELECT tile_id, v * 1024 // GREATEST((SELECT MAX(v) FROM a1r), 1)
         AS a FROM a1r),
h1r AS (
  SELECT p.tile_id, COALESCE(SUM(a1.a), 0) AS v
  FROM pn p LEFT JOIN ed ON ed.s = p.tile_id
  LEFT JOIN a1 ON a1.tile_id = ed.t
  GROUP BY p.tile_id
),
h1 AS (SELECT tile_id, v * 1024 // GREATEST((SELECT MAX(v) FROM h1r), 1)
         AS h FROM h1r),
a2r AS (
  SELECT p.tile_id, COALESCE(SUM(h1.h), 0) AS v
  FROM pn p LEFT JOIN ed ON ed.t = p.tile_id
  LEFT JOIN h1 ON h1.tile_id = ed.s
  GROUP BY p.tile_id
),
a2 AS (SELECT tile_id, v * 1024 // GREATEST((SELECT MAX(v) FROM a2r), 1)
         AS a FROM a2r),
h2r AS (
  SELECT p.tile_id, COALESCE(SUM(a2.a), 0) AS v
  FROM pn p LEFT JOIN ed ON ed.s = p.tile_id
  LEFT JOIN a2 ON a2.tile_id = ed.t
  GROUP BY p.tile_id
),
h2 AS (SELECT tile_id, v * 1024 // GREATEST((SELECT MAX(v) FROM h2r), 1)
         AS h FROM h2r)
SELECT h2.tile_id, CAST(h2.h AS BIGINT) AS h2, CAST(a2.a AS BIGINT) AS a2
FROM h2 JOIN a2 ON a2.tile_id = h2.tile_id
"""


def q_events_df_pieces(sf_dir: str):  # exact oracle (lagged OLS pieces)
    """DICKEY–FULLER unit-root pieces per event type — the stationarity
    screen of time-series modeling: regress the daily difference Δx on
    the lagged level x (Δx_t = ρ·x_{t−1} + ε); the exact pieces are
    rho_num = n·ΣxΔ − Σx·ΣΔ and rho_den = n·Σx² − (Σx)² (ρ = num/den;
    ρ ≈ 0 → unit root / random walk, ρ < 0 → mean reversion). Dollar
    scale keeps the cross products in int64. One (type, day) combiner;
    the lagged join runs on the day-bounded table."""
    ev = _rp(sf_dir, "events", ["event_type", "ts", "value"])

    def _day(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": df["event_type"].astype(str),
            "day": df["ts"].astype("int64").to_numpy() // 86_400_000_000,
            "vc": cents(df["value"].to_numpy())})

    daily = rel.partial_groupby_sum(
        ev.map_batches(_day, batch_format="pandas", batch_size=8192),
        ["event_type", "day"], ["vc"], est_rows=_nrows(sf_dir, "events"))
    df = daily.to_pandas()
    df["vd"] = df["vc"].astype(np.int64) // 100
    rows = []
    for et, g in df.groupby("event_type"):
        d = g.sort_values("day")
        days = d["day"].to_numpy(np.int64)
        x = d["vd"].to_numpy(np.int64)
        # pairs of CONSECUTIVE days only (gaps break the lag relation)
        m = days[1:] == days[:-1] + 1
        lagged = x[:-1][m]
        delta = (x[1:] - x[:-1])[m]
        nn = len(lagged)
        sx, sd = int(lagged.sum()), int(delta.sum())
        rows.append({"event_type": str(et), "n": nn,
                     "rho_num": nn * int((lagged * delta).sum()) - sx * sd,
                     "rho_den": nn * int((lagged * lagged).sum()) - sx * sx})
    return pd.DataFrame(rows)


SQL_EVENTS_DF_PIECES = """
WITH daily AS (
  SELECT event_type,
         CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day,
         SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS vc
  FROM events GROUP BY 1, 2
),
dd AS (SELECT event_type, day, vc // 100 AS vd FROM daily),
pairs AS (
  SELECT a.event_type, a.vd AS x, b.vd - a.vd AS dlt
  FROM dd a JOIN dd b
    ON b.event_type = a.event_type AND b.day = a.day + 1
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) * SUM(x * dlt) - SUM(x) * SUM(dlt) AS BIGINT)
         AS rho_num,
       CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS BIGINT) AS rho_den
FROM pairs GROUP BY event_type
"""


def q_image_skew_detect(sf_dir: str):  # exact oracle (sheared profile)
    """PROJECTION-PROFILE SKEW DETECTION through the decode path
    (``media.image_skew_detect``): for integer shears −2..2 on an ×8
    subpixel column grid, the Σ count² energy of the sheared column
    profile of the R-parity mask; the argmax shear (ties → smaller s)
    is the deskew angle — the document-scan normalization classic. On
    the stripe fixture the profile is an (i, j) cross join with the
    shifted-bucket GROUP BY; vertical stripes are axis-aligned so s = 0
    wins, but the oracle replays ALL candidates and takes the argmax.
    Emits (image_id, best_s, energy)."""
    docs = _rp(sf_dir, "documents", ["doc_id"])

    synth = docs.map_batches(_image_fixture_synth, batch_format="pyarrow", batch_size=512)
    return mstage.image_skew_detect(synth, batch_size=512)


SQL_IMAGE_SKEW_DETECT = """
WITH im AS (
  SELECT doc_id AS image_id,
         16 + (doc_id % 4) * 8 AS w, 12 + (doc_id % 3) * 6 AS h,
         doc_id % 3 AS fi,
         (doc_id * 7) % 200 AS br
  FROM documents
),
rq AS (
  SELECT image_id, j, h,
         (CASE WHEN fi = 2
               THEN ((br + (j * 55) // (w - 1)) // 4) * 4
                    + ((br + (j * 55) // (w - 1)) // 4) // 16
               ELSE br + (j * 55) // (w - 1) END) % 2 AS m
  FROM im, (SELECT unnest(range(40)) AS j) js WHERE j < w
),
pf AS (
  SELECT rq.image_id, s.s, 8 * rq.j + i.i * s.s AS b, COUNT(*) AS c
  FROM rq
  CROSS JOIN (SELECT unnest(range(24)) AS i) i
  CROSS JOIN (SELECT unnest([-2, -1, 0, 1, 2]) AS s) s
  WHERE rq.m = 1 AND i.i < rq.h
  GROUP BY 1, 2, 3
),
en AS (
  SELECT image_id, s, SUM(c * c) AS energy FROM pf GROUP BY image_id, s
),
best AS (
  SELECT image_id, s, energy,
         ROW_NUMBER() OVER (PARTITION BY image_id
                            ORDER BY energy DESC, s) AS rn
  FROM en
)
SELECT im.image_id,
       CAST(COALESCE(b.s, -2) AS BIGINT) AS best_s,
       CAST(COALESCE(b.energy, 0) AS BIGINT) AS energy
FROM im LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
  ON b.image_id = im.image_id
"""


def q_part_croston_pieces(sf_dir: str):  # exact oracle (state-replay CTE)
    """CROSTON'S METHOD per part (every 8th, offset 4 so the fleet
    differs from `part_holt_winters`) — THE forecasting method for
    INTERMITTENT demand (spare parts, long-tail SKUs), which Holt-class
    smoothers systematically bias: over the 12 monthly quantity sums,
    only NONZERO months update the two states — demand size z += (x −
    z)//4 and inter-demand interval p += (iv − p)//4 (iv = months since
    the previous nonzero; both truncating fixed point, ×16 scale;
    forecast rate = z/p is the caller's fold). Emits (l_partkey, z_fin,
    p_fin, n_nonzero). Oracle: the monthly LIST replayed one month per
    recursive round with the carried last-nonzero index."""
    li = _rp(sf_dir, "lineitem", ["l_partkey", "l_shipdate", "l_quantity"])

    def _prep(batch: pa.Table) -> pa.Table:
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = pk % 8 == 4
        sub = batch.filter(pa.array(keep))
        ts = sub["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        mo = (ts.astype("datetime64[us]").astype("datetime64[M]")
              .astype(np.int64) % 12 + 1)
        return pa.table({"l_partkey": pk[keep], "mo": mo,
                         "d": cents(sub["l_quantity"]
                                    .to_numpy(zero_copy_only=False), 1)})

    prep = li.map_batches(_prep, batch_format="pyarrow", batch_size=8192)
    sums = rel.partial_groupby_sum(prep, ["l_partkey", "mo"], ["d"],
                                   est_rows=_nrows(sf_dir, "lineitem"))
    df = sums.to_pandas()
    piv = df.pivot_table(index="l_partkey", columns="mo", values="d",
                         aggfunc="sum", fill_value=0)
    piv = piv.reindex(columns=range(1, 13), fill_value=0).astype(np.int64)

    def _tdiv(a: int, b: int) -> int:
        return -((-a) // b) if a < 0 else a // b

    rows = []
    for pk2, row in piv.iterrows():
        x = [int(v) for v in row.to_numpy(np.int64)]
        z = p = None
        last = 0
        nz = 0
        for m in range(1, 13):
            if x[m - 1] == 0:
                continue
            nz += 1
            iv = m - last
            last = m
            if z is None:
                z, p = x[m - 1] * 16, iv * 16
            else:
                z = z + _tdiv(x[m - 1] * 16 - z, 4)
                p = p + _tdiv(iv * 16 - p, 4)
        rows.append({"l_partkey": int(pk2),
                     "z_fin": z if z is not None else -1,
                     "p_fin": p if p is not None else -1,
                     "n_nonzero": nz})
    return pd.DataFrame(rows)


SQL_PART_CROSTON_PIECES = """
WITH RECURSIVE dm AS (
  SELECT l_partkey, CAST(EXTRACT(month FROM l_shipdate) AS BIGINT) AS mo,
         SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS d
  FROM lineitem WHERE l_partkey % 8 = 4
  GROUP BY 1, 2
),
grid AS (
  SELECT p.l_partkey, mm.mo, COALESCE(dm.d, 0) AS d
  FROM (SELECT DISTINCT l_partkey FROM dm) p
  CROSS JOIN (SELECT unnest(range(1, 13)) AS mo) mm
  LEFT JOIN dm ON dm.l_partkey = p.l_partkey AND dm.mo = mm.mo
),
lst AS (
  SELECT l_partkey, list(d ORDER BY mo) AS xs FROM grid GROUP BY l_partkey
),
cr AS (
  SELECT l_partkey, xs, 0 AS m, CAST(NULL AS BIGINT) AS z,
         CAST(NULL AS BIGINT) AS p, 0 AS last, CAST(0 AS BIGINT) AS nz
  FROM lst
  UNION ALL
  SELECT l_partkey, xs, m + 1,
         CASE WHEN xs[m + 1] = 0 THEN z
              WHEN z IS NULL THEN xs[m + 1] * 16
              ELSE z + (xs[m + 1] * 16 - z) // 4 END,
         CASE WHEN xs[m + 1] = 0 THEN p
              WHEN p IS NULL THEN (m + 1 - last) * 16
              ELSE p + ((m + 1 - last) * 16 - p) // 4 END,
         CASE WHEN xs[m + 1] = 0 THEN last ELSE m + 1 END,
         nz + CASE WHEN xs[m + 1] = 0 THEN 0 ELSE 1 END
  FROM cr WHERE m < 12
)
SELECT l_partkey, CAST(COALESCE(z, -1) AS BIGINT) AS z_fin,
       CAST(COALESCE(p, -1) AS BIGINT) AS p_fin,
       CAST(nz AS BIGINT) AS n_nonzero
FROM cr WHERE m = 12
"""


def q_tile_modularity_pieces(sf_dir: str):  # exact oracle (degree sums)
    """GRAPH MODULARITY pieces of the spatial-quadrant partition of the
    probe 2-NN graph — "are nearby tiles wired together?" as Newman's Q
    in exact integers: with undirected edge multiset E (each probe's 2
    nearest, symmetrized with multiplicity), communities = the four
    coordinate quadrants; per community the pieces are in_c (edge
    endpoints inside×2... precisely: 2·|internal edges|) and deg_c, and
    Q·(2m)² = Σ_c (2m·in_c − deg_c²). Emits one row per community
    (quad, in2, deg, m2) — spatial assortativity made exact."""
    t = td.tiles_table(sf_dir)
    tid = t["tile_id"].to_numpy().astype(np.int64)
    cx = t["cx"].to_numpy().astype(np.int64)
    cy = t["cy"].to_numpy().astype(np.int64)
    pm = tid % 10 == 0
    tid, cx, cy = tid[pm], cx[pm], cy[pm]
    order = np.argsort(tid)
    tid, cx, cy = tid[order], cx[order], cy[order]
    n = len(tid)
    quad = (cx >= 32768).astype(np.int64) * 2 + (cy >= 32768).astype(np.int64)
    src_l, dst_l = [], []
    for i in range(n):
        d2 = (cx - cx[i]) ** 2 + (cy - cy[i]) ** 2
        cand = np.lexsort((tid, d2))
        cnt = 0
        for j in cand:
            if j == i:
                continue
            src_l.append(i)
            dst_l.append(int(j))
            cnt += 1
            if cnt == 2:
                break
    s = np.asarray(src_l, np.int64)
    d = np.asarray(dst_l, np.int64)
    # symmetrize with multiplicity: each directed pick counts once each way
    us = np.concatenate([s, d])
    ud = np.concatenate([d, s])
    m2 = len(us)  # = 2m
    deg = np.bincount(us, minlength=n)
    rows = []
    for q in range(4):
        inq = quad == q
        in2 = int((inq[us] & inq[ud]).sum())
        rows.append({"quad": q, "in2": in2,
                     "deg": int(deg[inq].sum()), "m2": m2})
    return pd.DataFrame(rows).astype(np.int64)


SQL_TILE_MODULARITY_PIECES = f"""WITH tiles AS ({td.TILES_SQL}),
pn AS (
  SELECT tile_id, cx, cy,
         CAST(cx >= 32768 AS BIGINT) * 2 + CAST(cy >= 32768 AS BIGINT)
           AS quad
  FROM tiles WHERE tile_id % 10 = 0
),
pk AS (
  SELECT s, t FROM (
    SELECT a.tile_id AS s, b.tile_id AS t,
           ROW_NUMBER() OVER (
             PARTITION BY a.tile_id
             ORDER BY (a.cx - b.cx) * (a.cx - b.cx)
                    + (a.cy - b.cy) * (a.cy - b.cy), b.tile_id) AS rn
    FROM pn a JOIN pn b ON b.tile_id <> a.tile_id
  ) WHERE rn <= 2
),
ed AS (
  SELECT s, t FROM pk UNION ALL SELECT t, s FROM pk
),
eq AS (
  SELECT ed.s, ed.t, ps.quad AS qs, pt.quad AS qt
  FROM ed JOIN pn ps ON ps.tile_id = ed.s
          JOIN pn pt ON pt.tile_id = ed.t
),
m2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM eq)
SELECT q.quad,
       CAST(COALESCE(SUM(CASE WHEN eq.qs = q.quad AND eq.qt = q.quad
                          THEN 1 ELSE 0 END), 0) AS BIGINT) AS in2,
       CAST(COALESCE(SUM(CASE WHEN eq.qs = q.quad THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS deg,
       (SELECT v FROM m2) AS m2
FROM (SELECT unnest(range(4)) AS quad) q
LEFT JOIN eq ON TRUE
GROUP BY q.quad
"""


def q_doc_word_burstiness(sf_dir: str):  # exact oracle (cf/df quotient)
    """WORD BURSTINESS (Church–Gale) over the corpus: collection
    frequency vs document frequency; burst_q = cf·10⁶ // df ranks words
    by how much they CLUMP when they appear (topical words are bursty,
    function words are not) — the term-weighting insight behind df-based
    IDF; top-20 by (burst_q desc, word asc) among words with df ≥ 3.
    (word, cf, df) partials ride one bucketed combine (df via per-doc
    dedup in the batch partial)."""
    from ..functions.text import _WORD_ASCII_RE
    from ..stages.relational import bucketed_groups

    docs = _rp(sf_dir, "documents", ["text"])

    def _pre(df: pd.DataFrame) -> pd.DataFrame:
        cf: dict[str, int] = {}
        dfc: dict[str, int] = {}
        for t in df["text"]:
            ws = _WORD_ASCII_RE.findall((t or "").lower())
            for w in ws:
                cf[w] = cf.get(w, 0) + 1
            for w in set(ws):
                dfc[w] = dfc.get(w, 0) + 1
        words = sorted(cf)
        return pd.DataFrame({
            "word": np.asarray(words, object),
            "cf": np.asarray([cf[w] for w in words], np.int64),
            "df": np.asarray([dfc[w] for w in words], np.int64)})

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("word", as_index=False).agg(cf=("cf", "sum"),
                                                    df=("df", "sum"))
        tot = tot[tot["df"] >= 3]
        tot["burst_q"] = (tot["cf"].astype(np.int64) * 1000000
                          // tot["df"].astype(np.int64))
        return tot.sort_values(["burst_q", "word"],
                               ascending=[False, True],
                               kind="mergesort").head(20)

    parts = bucketed_groups(docs, ["word"], _final, pre_fn=_pre,
                            est_rows=_nrows(sf_dir, "documents"))
    out = parts.to_pandas().sort_values(["burst_q", "word"],
                                        ascending=[False, True],
                                        kind="mergesort").head(20)
    return out[["word", "cf", "df", "burst_q"]].astype(
        {"cf": np.int64, "df": np.int64, "burst_q": np.int64}
    ).reset_index(drop=True)


SQL_DOC_WORD_BURSTINESS = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[0-9a-z_]+')) AS w
  FROM documents
),
stats AS (
  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS cf,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM toks GROUP BY w
)
SELECT word, cf, df, CAST(cf * 1000000 // df AS BIGINT) AS burst_q
FROM stats WHERE df >= 3
ORDER BY burst_q DESC, word LIMIT 20
"""


def q_customer_km_table(sf_dir: str):  # exact oracle (reverse cumsum)
    """KAPLAN–MEIER LIFETABLE of customer activity — survival analysis'
    core artifact: lifespan = whole months between a customer's first
    and last order (single-order customers die at month 0); per month m
    the table rows are n_at_risk = #customers with lifespan ≥ m and
    d_events = #customers with lifespan = m (no censoring in the fixed
    window, so Ŝ(m) = Π(1 − d/n) is the caller's exact-rational fold).
    One per-customer combiner (min/max order ts) + a month-bounded
    reverse cumsum."""
    od = _rp(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def _mm(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["o_orderdate"].astype("int64").to_numpy()
        mo = ts // 86_400_000_000 // 30
        return pd.DataFrame({"o_custkey": df["o_custkey"].to_numpy(np.int64),
                             "mn": mo, "mx": mo})

    from ..stages.relational import bucketed_groups

    def _span(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("o_custkey", as_index=False).agg(mn=("mn", "min"),
                                                       mx=("mx", "max"))
        a["life"] = (a["mx"] - a["mn"]).astype(np.int64)
        return a[["o_custkey", "life"]]

    spans = bucketed_groups(
        od.map_batches(_mm, batch_format="pandas", batch_size=8192),
        ["o_custkey"], _span).to_pandas()
    life = spans["life"].to_numpy(np.int64)
    mmax = int(life.max()) if len(life) else 0
    rows = []
    for m in range(mmax + 1):
        rows.append({"m": m, "n_at_risk": int((life >= m).sum()),
                     "d_events": int((life == m).sum())})
    return pd.DataFrame(rows).astype(np.int64)


SQL_CUSTOMER_KM_TABLE = """
WITH spans AS (
  SELECT o_custkey,
         MAX(CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000 // 30)
         - MIN(CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000 // 30)
           AS life
  FROM orders GROUP BY o_custkey
),
mm AS (SELECT unnest(range(0, (SELECT MAX(life) + 1 FROM spans))) AS m)
SELECT CAST(mm.m AS BIGINT) AS m,
       CAST(SUM(CASE WHEN s.life >= mm.m THEN 1 ELSE 0 END) AS BIGINT)
         AS n_at_risk,
       CAST(SUM(CASE WHEN s.life = mm.m THEN 1 ELSE 0 END) AS BIGINT)
         AS d_events
FROM mm CROSS JOIN spans s
GROUP BY mm.m
"""


def q_doc_texttiling(sf_dir: str):  # exact oracle (block-overlap valleys)
    """TEXTTILING-lite TOPIC SEGMENTATION per document (every 10th):
    tokens split into consecutive FULL blocks of 15; the cohesion score
    between adjacent blocks is their DISTINCT-token overlap, and a block
    gap is a topic BOUNDARY iff its score is a strict local valley —
    Hearst's discourse-segmentation classic in exact integers, the
    structural chunker RAG pipelines use when fixed windows cut
    mid-topic. Emits (doc_id, n_blocks, n_gaps, n_boundaries, sim_sum).
    Engine: per-doc set overlaps; oracle: (doc, block, word) DISTINCT
    rows, adjacent-block join counts, LAG/LEAD valley test."""
    from ..functions.text import _WORD_ASCII_RE
    from ..stages.relational import bucketed_groups

    docs = _rp(sf_dir, "documents", ["doc_id", "text"])

    def _keep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(ids % 10 == 0))

    kept = docs.map_batches(_keep, batch_format="pyarrow", batch_size=8192)
    B = 15

    def _tile(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for did, text in zip(g["doc_id"].to_numpy(np.int64), g["text"]):
            ws = _WORD_ASCII_RE.findall((text or "").lower())
            nb = len(ws) // B
            blocks = [set(ws[k * B:(k + 1) * B]) for k in range(nb)]
            sims = [len(blocks[k] & blocks[k + 1]) for k in range(nb - 1)]
            nbd = sum(1 for k in range(1, len(sims) - 1)
                      if sims[k] < sims[k - 1] and sims[k] < sims[k + 1])
            rows.append({"doc_id": int(did), "n_blocks": nb,
                         "n_gaps": max(nb - 1, 0),
                         "n_boundaries": nbd, "sim_sum": sum(sims)})
        return pd.DataFrame(rows)

    return bucketed_groups(kept, ["doc_id"], _tile)


SQL_DOC_TEXTTILING = """
WITH toks AS (
  SELECT doc_id, j, w[j] AS word, len(w) AS n
  FROM (SELECT doc_id,
               regexp_extract_all(lower(text), '[0-9a-z_]+') AS w
        FROM documents WHERE doc_id % 10 = 0),
       (SELECT unnest(range(1, 200)) AS j) js
  WHERE j <= len(w) AND (j - 1) // 15 < len(w) // 15
),
bw AS (
  SELECT DISTINCT doc_id, (j - 1) // 15 AS blk, word FROM toks
),
sims AS (
  SELECT a.doc_id, a.blk AS k, COUNT(*) AS sim
  FROM bw a JOIN bw b
    ON b.doc_id = a.doc_id AND b.blk = a.blk + 1 AND b.word = a.word
  GROUP BY a.doc_id, a.blk
),
base AS (
  SELECT d.doc_id, len(d.w) // 15 AS nb,
         GREATEST(len(d.w) // 15 - 1, 0) AS n_gaps
  FROM (SELECT doc_id,
               regexp_extract_all(lower(text), '[0-9a-z_]+') AS w
        FROM documents WHERE doc_id % 10 = 0) d
),
grid AS (
  -- every adjacent-block gap, zero-sim gaps included
  SELECT b.doc_id, gk.k, COALESCE(s.sim, 0) AS sim
  FROM base b
  JOIN (SELECT unnest(range(0, 20)) AS k) gk ON gk.k < b.n_gaps
  LEFT JOIN sims s ON s.doc_id = b.doc_id AND s.k = gk.k
),
vl AS (
  SELECT doc_id, k, sim,
         LAG(sim)  OVER (PARTITION BY doc_id ORDER BY k) AS ps,
         LEAD(sim) OVER (PARTITION BY doc_id ORDER BY k) AS ns
  FROM grid
)
SELECT b.doc_id, CAST(b.nb AS BIGINT) AS n_blocks,
       CAST(b.n_gaps AS BIGINT) AS n_gaps,
       CAST(COALESCE(SUM(CASE WHEN vl.ps IS NOT NULL
                               AND vl.ns IS NOT NULL
                               AND vl.sim < vl.ps AND vl.sim < vl.ns
                          THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_boundaries,
       CAST(COALESCE(SUM(vl.sim), 0) AS BIGINT) AS sim_sum
FROM base b LEFT JOIN vl ON vl.doc_id = b.doc_id
GROUP BY b.doc_id, b.nb, b.n_gaps
"""


def q_tile_clarke_wright(sf_dir: str):  # exact oracle (pair savings rank)
    """CLARKE–WRIGHT SAVINGS ranking over the depot tiles (every 50th;
    central depot at (32768, 32768), MANHATTAN distances so everything
    stays integer): s(i,j) = d(0,i) + d(0,j) − d(i,j) measures how much
    route length merging customers i and j saves — the opening move of
    the classic vehicle-routing heuristic; emits the top-20 pairs by
    (savings desc, i, j). Depot set is dimension-sized; the pair table
    is P²-bounded."""
    t = td.tiles_table(sf_dir)
    tid = t["tile_id"].to_numpy().astype(np.int64)
    cx = t["cx"].to_numpy().astype(np.int64)
    cy = t["cy"].to_numpy().astype(np.int64)
    pm = tid % 50 == 0
    tid, cx, cy = tid[pm], cx[pm], cy[pm]
    d0 = np.abs(cx - 32768) + np.abs(cy - 32768)
    rows = []
    n = len(tid)
    for i in range(n):
        for j in range(i + 1, n):
            dij = abs(int(cx[i] - cx[j])) + abs(int(cy[i] - cy[j]))
            rows.append((int(d0[i]) + int(d0[j]) - dij,
                         int(tid[i]), int(tid[j])))
    rows.sort(key=lambda r: (-r[0], r[1], r[2]))
    top = rows[:20]
    return pd.DataFrame({"a_id": [r[1] for r in top],
                         "b_id": [r[2] for r in top],
                         "savings": [r[0] for r in top]}).astype(np.int64)


SQL_TILE_CLARKE_WRIGHT = f"""WITH tiles AS ({td.TILES_SQL}),
pn AS (SELECT tile_id, cx, cy,
              ABS(cx - 32768) + ABS(cy - 32768) AS d0
       FROM tiles WHERE tile_id % 50 = 0)
SELECT a.tile_id AS a_id, b.tile_id AS b_id,
       CAST(a.d0 + b.d0 - (ABS(a.cx - b.cx) + ABS(a.cy - b.cy))
            AS BIGINT) AS savings
FROM pn a JOIN pn b ON b.tile_id > a.tile_id
ORDER BY savings DESC, a_id, b_id LIMIT 20
"""


def q_nation_supplier_hhi(sf_dir: str):  # exact oracle (share pieces)
    """HERFINDAHL–HIRSCHMAN CONCENTRATION pieces per nation — the
    antitrust market-concentration index over supplier revenue shares:
    HHI = Σ(s_i/S)² folds from the exact pieces sum_sq = Σ s_i² and
    total = Σ s_i (×10⁴ gives the familiar 0–10000 scale); also emits
    n_suppliers and the leader's share pieces (top1_c). Supplier→nation
    via the supplier table broadcast; one (nation, supplier) combiner +
    a nations-bounded rollup."""
    li = _rp(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice"])
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    s2n = dict(zip(sup["s_suppkey"].to_numpy().tolist(),
                   sup["s_nationkey"].to_numpy().tolist()))
    n2name = dict(zip(nat["n_nationkey"].to_numpy().tolist(),
                      nat["n_name"].to_pylist()))
    ref = ray.put(s2n)

    def _prep(batch: pa.Table) -> pa.Table:
        from ..stages.util import cached_state

        lookup = cached_state(ref, lambda d: d, token="hhi.s2n")
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "nk": np.array([lookup[int(s)] for s in sk], np.int64),
            "l_suppkey": sk,
            "rev": cents(batch["l_extendedprice"]
                         .to_numpy(zero_copy_only=False))})

    rolled = rel.partial_groupby_sum(
        li.map_batches(_prep, batch_format="pyarrow", batch_size=8192),
        ["nk", "l_suppkey"], ["rev"], est_rows=_nrows(sf_dir, "lineitem"))
    df = rolled.to_pandas()  # suppliers-bounded
    df["rev"] = df["rev"].astype(np.int64) // 100  # divide AFTER the sum
    g = df.groupby("nk")
    out = pd.DataFrame({
        "n_name": [n2name[int(k)] for k in g.groups],
        "n_suppliers": g.size().to_numpy(np.int64),
        "total_d": g["rev"].sum().to_numpy(np.int64),
        "sum_sq": g["rev"].apply(
            lambda s: int((s.astype(np.int64) ** 2).sum()))
        .to_numpy(np.int64),
        "top1_d": g["rev"].max().to_numpy(np.int64)})
    return out.reset_index(drop=True)


SQL_NATION_SUPPLIER_HHI = """
WITH sr AS (
  SELECT n.n_name, l.l_suppkey,
         SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)) // 100
           AS rev
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  GROUP BY 1, 2
)
SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(rev) AS BIGINT) AS total_d,
       CAST(SUM(rev * rev) AS BIGINT) AS sum_sq,
       CAST(MAX(rev) AS BIGINT) AS top1_d
FROM sr GROUP BY n_name
"""


def q_events_regime_viterbi(sf_dir: str):  # exact oracle (DP-pair CTE)
    """2-STATE REGIME SWITCHING by exact-integer Viterbi per event type —
    the econometric regime-detection classic (calm vs volatile), the
    time-series sibling of `trajectory_match_hmm`: state centers are the
    day-value order statistics at ranks ⌈n/4⌉ and ⌈3n/4⌉ (the quartile
    device of `events_sax_symbols`), emission cost = |x − center|,
    switch penalty = 500; the DP carries (cost_lo, cost_hi) per day and
    the final answer is the cheaper terminal with its switch count
    recovered by an argmin-consistent backward convention (counted
    forward: switches where the chosen predecessor differs). Emits per
    type (n_days, best_cost, end_state, n_switches)."""
    ev = _rp(sf_dir, "events", ["event_type", "ts", "value"])

    def _day(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": df["event_type"].astype(str),
            "day": df["ts"].astype("int64").to_numpy() // 86_400_000_000,
            "vc": cents(df["value"].to_numpy())})

    daily = rel.partial_groupby_sum(
        ev.map_batches(_day, batch_format="pandas", batch_size=8192),
        ["event_type", "day"], ["vc"], est_rows=_nrows(sf_dir, "events"))
    df = daily.to_pandas()
    df["vd"] = df["vc"].astype(np.int64) // 100
    T = 500
    rows = []
    for et, g in df.groupby("event_type"):
        d = g.sort_values("day")
        x = d["vd"].to_numpy(np.int64)
        n = len(d)
        srt = np.sort(x)
        c_lo = int(srt[-(-n // 4) - 1])
        c_hi = int(srt[-(-(3 * n) // 4) - 1])
        INF = 1 << 60
        cost = [abs(int(x[0]) - c_lo), abs(int(x[0]) - c_hi)]
        sw = [0, 0]
        for i in range(1, n):
            e_lo = abs(int(x[i]) - c_lo)
            e_hi = abs(int(x[i]) - c_hi)
            stay_lo, jump_lo = cost[0], cost[1] + T
            new0 = (e_lo + stay_lo, sw[0]) if stay_lo <= jump_lo \
                else (e_lo + jump_lo, sw[1] + 1)
            stay_hi, jump_hi = cost[1], cost[0] + T
            new1 = (e_hi + stay_hi, sw[1]) if stay_hi <= jump_hi \
                else (e_hi + jump_hi, sw[0] + 1)
            cost = [new0[0], new1[0]]
            sw = [new0[1], new1[1]]
        end = 0 if cost[0] <= cost[1] else 1
        rows.append({"event_type": str(et), "n_days": n,
                     "best_cost": int(cost[end]), "end_state": end,
                     "n_switches": int(sw[end])})
    return pd.DataFrame(rows)


SQL_EVENTS_REGIME_VITERBI = """
WITH RECURSIVE daily AS (
  SELECT event_type,
         CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day,
         SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) // 100 AS vd
  FROM events GROUP BY 1, 2
),
rk AS (
  SELECT event_type, day, vd,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY vd, day) AS i,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM daily
),
cen AS (
  SELECT event_type,
         MAX(CASE WHEN i = (n + 3) // 4 THEN vd END) AS c_lo,
         MAX(CASE WHEN i = (3 * n + 3) // 4 THEN vd END) AS c_hi
  FROM rk GROUP BY event_type
),
lst AS (
  SELECT d.event_type, list(d.vd ORDER BY d.day) AS xs,
         MAX(c.c_lo) AS c_lo, MAX(c.c_hi) AS c_hi,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM daily d JOIN cen c ON c.event_type = d.event_type
  GROUP BY d.event_type
),
vit AS (
  SELECT event_type, xs, c_lo, c_hi, n, 1 AS k,
         ABS(xs[1] - c_lo) AS cost0, ABS(xs[1] - c_hi) AS cost1,
         CAST(0 AS BIGINT) AS sw0, CAST(0 AS BIGINT) AS sw1
  FROM lst
  UNION ALL
  SELECT event_type, xs, c_lo, c_hi, n, k + 1,
         ABS(xs[k + 1] - c_lo)
           + CASE WHEN cost0 <= cost1 + 500 THEN cost0
                  ELSE cost1 + 500 END,
         ABS(xs[k + 1] - c_hi)
           + CASE WHEN cost1 <= cost0 + 500 THEN cost1
                  ELSE cost0 + 500 END,
         CASE WHEN cost0 <= cost1 + 500 THEN sw0 ELSE sw1 + 1 END,
         CASE WHEN cost1 <= cost0 + 500 THEN sw1 ELSE sw0 + 1 END
  FROM vit WHERE k < n
)
SELECT event_type, n AS n_days,
       CAST(CASE WHEN cost0 <= cost1 THEN cost0 ELSE cost1 END AS BIGINT)
         AS best_cost,
       CAST(CASE WHEN cost0 <= cost1 THEN 0 ELSE 1 END AS BIGINT)
         AS end_state,
       CAST(CASE WHEN cost0 <= cost1 THEN sw0 ELSE sw1 END AS BIGINT)
         AS n_switches
FROM vit WHERE k = n
"""


def q_embedding_ndcg5(sf_dir: str):  # exact oracle (lcm-weight DCG)
    """NDCG@5 in EXACT integers — the ranking-quality metric of every
    retrieval eval, made division-free with lcm weights: top-5 by
    fixed-point dot product against each query (vec_id < 8, corpus =
    every 10th vector, ties → smaller id); relevance = label match;
    DCG60 = Σ rel_r · (60/(1+r)) uses the 1/(1+rank) discount whose
    weights 30/20/15/12/10 are exact after ×60; IDCG60 = the best
    achievable given how many relevant exist (min(m, 5) top weights).
    NDCG = dcg60/idcg60 is the caller's rational fold. Emits
    (query_id, n_rel, dcg60, idcg60)."""
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding", "label"])
    ids = emb["vec_id"].to_numpy().astype(np.int64)
    lab = emb["label"].to_numpy().astype(np.int64)
    mat = ann.quantize_fixed(np.stack(emb["embedding"].to_pylist())
                             .astype(np.float64))
    corpus = ids % 10 == 0
    cid, clab, cmat = ids[corpus], lab[corpus], mat[corpus]
    weights = [30, 20, 15, 12, 10]
    rows = []
    for qi in np.flatnonzero(ids < 8):
        q = mat[qi]
        qid = int(ids[qi])
        dots = cmat @ q
        keep = cid != qid
        dd, ii, ll = dots[keep], cid[keep], clab[keep]
        order = np.lexsort((ii, -dd))[:5]
        rel = (ll[order] == lab[qi]).astype(np.int64)
        dcg = int(sum(int(r) * w for r, w in zip(rel, weights)))
        m = int((ll == lab[qi]).sum())
        idcg = int(sum(weights[:min(m, 5)]))
        rows.append({"query_id": qid, "n_rel": m, "dcg60": dcg,
                     "idcg60": idcg})
    return pd.DataFrame(rows)


SQL_EMBEDDING_NDCG5 = """
WITH e AS ({emb}),
el AS (
  SELECT e.vec_id, e.qv, CAST(emb2.label AS BIGINT) AS label
  FROM e JOIN embeddings emb2 ON emb2.vec_id = e.vec_id
),
q AS (SELECT vec_id AS query_id, qv AS quv, label AS qlab
      FROM el WHERE vec_id < 8),
d AS (SELECT vec_id, qv, label FROM el WHERE vec_id % 10 = 0),
sims AS (
  SELECT q.query_id, q.qlab, d.vec_id, d.label,
         CAST(list_dot_product(
           list_transform(q.quv, x -> CAST(x AS DOUBLE)),
           list_transform(d.qv, x -> CAST(x AS DOUBLE))) AS BIGINT) AS dot
  FROM q CROSS JOIN d WHERE d.vec_id <> q.query_id
),
top5 AS (
  SELECT query_id, qlab, vec_id, label,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY dot DESC, vec_id) AS r
  FROM sims
),
dcg AS (
  SELECT query_id,
         SUM(CASE WHEN label = qlab THEN
             CASE r WHEN 1 THEN 30 WHEN 2 THEN 20 WHEN 3 THEN 15
                    WHEN 4 THEN 12 ELSE 10 END ELSE 0 END) AS dcg60
  FROM top5 WHERE r <= 5 GROUP BY query_id
),
nrel AS (
  SELECT q.query_id, CAST(COUNT(*) AS BIGINT) AS m
  FROM q JOIN d ON d.label = q.qlab AND d.vec_id <> q.query_id
  GROUP BY q.query_id
),
ideal AS (
  SELECT query_id, m,
         CASE WHEN m >= 5 THEN 87 WHEN m = 4 THEN 77 WHEN m = 3 THEN 65
              WHEN m = 2 THEN 50 WHEN m = 1 THEN 30 ELSE 0 END AS idcg60
  FROM nrel
)
SELECT i.query_id, CAST(i.m AS BIGINT) AS n_rel,
       CAST(COALESCE(g.dcg60, 0) AS BIGINT) AS dcg60,
       CAST(i.idcg60 AS BIGINT) AS idcg60
FROM ideal i LEFT JOIN dcg g ON g.query_id = i.query_id
""".format(emb=_SQL_EMB_FIXED.format(src="embeddings"))


def q_supplier_mann_kendall(sf_dir: str):  # exact oracle (pair self-join)
    """MANN-KENDALL trend test per supplier over the 12 monthly quantity
    sums — the nonparametric significance COMPANION of the Theil-Sen
    slope (`supplier_theilsen_trend` answers "how steep", this answers
    "is there a trend at all"): S = Σ_{i<j} sign(q_j − q_i) in month
    order, plus the exact integer variance numerator
    18·Var = n(n−1)(2n+5) − Σ_ties t(t−1)(2t+5). Same shape as Theil-Sen:
    one combiner-first (supp, month) rollup, then a supplier-bucketed pass
    over ≤66 pairs per group."""
    li = _rp(sf_dir, "lineitem", ["l_suppkey", "l_shipdate", "l_quantity"])

    def _derive(t: pa.Table) -> pa.Table:
        ts = t["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        mo = (ts.astype("datetime64[us]").astype("datetime64[M]")
              .astype(np.int64) % 12 + 1)
        return pa.table({
            "l_suppkey": t["l_suppkey"], "mo": mo,
            "q": t["l_quantity"].to_numpy(zero_copy_only=False)
                 .astype(np.int64)})

    derived = li.map_batches(_derive, batch_format="pyarrow",
                             batch_size=65536)
    monthly = rel.partial_groupby_sum(derived, ["l_suppkey", "mo"], ["q"],
                                      est_rows=_nrows(sf_dir, "lineitem"))

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for supp, g in df.groupby("l_suppkey", sort=False):
            g = g.sort_values("mo")
            q = g["q"].to_numpy(np.int64)
            n = len(q)
            i, j = np.triu_indices(n, k=1)
            s = int(np.sign(q[j] - q[i]).sum())
            _, t_cnt = np.unique(q, return_counts=True)
            var18 = int(n * (n - 1) * (2 * n + 5)
                        - (t_cnt * (t_cnt - 1) * (2 * t_cnt + 5)).sum())
            rows.append((np.int64(supp), np.int64(n), np.int64(s),
                         np.int64(var18)))
        return pd.DataFrame(rows, columns=["l_suppkey", "n_months",
                                           "s_stat", "var18"])

    return rel.bucketed_groups(monthly, ["l_suppkey"], _final,
                               est_rows=_nrows(sf_dir, "supplier"))


SQL_SUPPLIER_MANN_KENDALL = """
WITH m AS (
  SELECT l_suppkey, EXTRACT(MONTH FROM l_shipdate) AS mo,
         SUM(CAST(l_quantity AS BIGINT)) AS q
  FROM lineitem GROUP BY 1, 2
),
p AS (
  SELECT a.l_suppkey, SUM(SIGN(b.q - a.q)) AS s
  FROM m a JOIN m b ON b.l_suppkey = a.l_suppkey AND b.mo > a.mo
  GROUP BY 1
),
n AS (SELECT l_suppkey, COUNT(*) AS n FROM m GROUP BY 1),
t AS (
  SELECT l_suppkey, SUM(t * (t - 1) * (2 * t + 5)) AS tie
  FROM (SELECT l_suppkey, q, COUNT(*) AS t FROM m GROUP BY 1, 2)
  GROUP BY 1
)
SELECT n.l_suppkey, CAST(n.n AS BIGINT) AS n_months,
       CAST(COALESCE(p.s, 0) AS BIGINT) AS s_stat,
       CAST(n.n * (n.n - 1) * (2 * n.n + 5) - t.tie AS BIGINT) AS var18
FROM n LEFT JOIN p ON p.l_suppkey = n.l_suppkey
       JOIN t ON t.l_suppkey = n.l_suppkey
"""


def q_points_str_pack(sf_dir: str):  # exact oracle (ROW_NUMBER rank replay)
    """SORT-TILE-RECURSIVE R-tree bulk load (``spatial.str_pack_pages``)
    over the full probe-point set: global (x, id) rank → S vertical slabs
    of cap·S rows (S = ⌈√⌈n/cap⌉⌉) → per-slab (y, id) rank → pages of
    cap — one row per leaf page with its MBR. This is the INDEX BUILD
    itself as a distributed operator (the in-memory ``state.strtree``
    builds the same packing per worker for the broadcast side; this path
    is for when the INDEXED side is the 100 TB one). Two bucketed
    shuffles, never a global sort on one node; the x-rank is a two-phase
    prefix sum over value-domain-bounded chunk counts."""
    pts = conflation.read_points(sf_dir)
    n = _nrows(sf_dir, "lineitem")
    return spatial.str_pack_pages(pts, n_rows=n)


SQL_POINTS_STR_PACK = _CTES + """,
xr AS (
  SELECT point_id, px, py,
         ROW_NUMBER() OVER (ORDER BY px, point_id) - 1 AS xrank,
         COUNT(*) OVER () AS n
  FROM points
),
sl AS (
  SELECT point_id, px, py,
         xrank // (64 * CAST(CEIL(SQRT(CEIL(n / 64.0))) AS BIGINT)) AS slab
  FROM xr
),
yr AS (
  SELECT slab, px, py,
         ROW_NUMBER() OVER (PARTITION BY slab ORDER BY py, point_id) - 1
           AS yrank
  FROM sl
)
SELECT CAST(slab * 1000000 + yrank // 64 AS BIGINT) AS page_id,
       CAST(COUNT(*) AS BIGINT) AS n_entries,
       CAST(MIN(px) AS BIGINT) AS x0, CAST(MIN(py) AS BIGINT) AS y0,
       CAST(MAX(px) AS BIGINT) AS x1, CAST(MAX(py) AS BIGINT) AS y1
FROM yr GROUP BY 1
"""


def _two_sample_counts(sf_dir: str, type_a: str, type_b: str):
    """Shared distributed core of the two-sample rank statistics: per-side
    per-cents-value counts via the map-side combiner (the count table is
    VALUE-DOMAIN-bounded — ≤ ~49k distinct cents per side regardless of
    row count — so the driver finalize is O(distinct values), documented
    bounded). Returns (values, ca, cb) sorted by value."""
    ev = _rp(sf_dir, "events", ["event_type", "value"])

    def _prep(batch: pa.Table) -> pa.Table:
        t = batch["event_type"].to_numpy(zero_copy_only=False)
        keep = (t == type_a) | (t == type_b)
        v = cents(batch["value"].to_numpy(zero_copy_only=False)[keep])
        side = (t[keep] == type_b).astype(np.int64)
        return pa.table({"side": side, "v": v})

    c = rel.partial_groupby_sum(
        ev.map_batches(_prep, batch_format="pyarrow", batch_size=65536),
        ["side", "v"], [], count_as="c").to_pandas()
    piv = c.pivot_table(index="v", columns="side", values="c",
                        aggfunc="sum", fill_value=0)
    vals = piv.index.to_numpy(np.int64)
    ca = (piv[0].to_numpy(np.int64) if 0 in piv.columns
          else np.zeros(len(vals), np.int64))
    cb = (piv[1].to_numpy(np.int64) if 1 in piv.columns
          else np.zeros(len(vals), np.int64))
    return vals, ca, cb


def q_events_mannwhitney(sf_dir: str):  # exact oracle (window cum-count)
    """MANN-WHITNEY U / AUC between the 'click' and 'error' value samples
    as exact integers: u2 = 2·#(a>b) + #(a=b) over all cross pairs (so
    AUC = u2 / (2·n_a·n_b) exactly) — the nonparametric A/B significance
    and ROC-AUC primitive. Never forms pairs: per-side value counts
    (combiner-first, value-domain-bounded) + a cumulative cross-multiply,
    identical shape to the SQL window mirror."""
    vals, ca, cb = _two_sample_counts(sf_dir, "click", "error")
    cumb = np.concatenate([[0], np.cumsum(cb)[:-1]])
    u2 = int((ca * (2 * cumb + cb)).sum())
    ties = int((ca * cb).sum())
    return pa.table({
        "n_a": pa.array([int(ca.sum())], pa.int64()),
        "n_b": pa.array([int(cb.sum())], pa.int64()),
        "u2": pa.array([u2], pa.int64()),
        "ties": pa.array([ties], pa.int64()),
    })


SQL_EVENTS_MANNWHITNEY = """
WITH ab AS (
  SELECT CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS side,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v
  FROM events WHERE event_type IN ('click', 'error')
),
c AS (SELECT side, v, COUNT(*) AS c FROM ab GROUP BY side, v),
m AS (
  SELECT v,
         COALESCE(SUM(CASE WHEN side = 0 THEN c END), 0) AS ca,
         COALESCE(SUM(CASE WHEN side = 1 THEN c END), 0) AS cb
  FROM c GROUP BY v
),
w AS (
  SELECT v, ca, cb,
         COALESCE(SUM(cb) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
  FROM m
)
SELECT CAST((SELECT SUM(ca) FROM m) AS BIGINT) AS n_a,
       CAST((SELECT SUM(cb) FROM m) AS BIGINT) AS n_b,
       CAST(SUM(ca * (2 * cumb + cb)) AS BIGINT) AS u2,
       CAST(SUM(ca * cb) AS BIGINT) AS ties
FROM w
"""


def q_events_ks_stat(sf_dir: str):  # exact oracle (window ECDF cross-mult)
    """Two-sample KOLMOGOROV-SMIRNOV statistic between the 'view' and
    'purchase' value samples as exact integers: d_num = max over values of
    |cumA(v)·n_b − cumB(v)·n_a| (so D = d_num / (n_a·n_b) exactly), plus
    the smallest cents value attaining it — the distribution-drift
    detector of a data-quality pipeline. Same value-domain-bounded count
    core as Mann-Whitney; the max scan is a cumsum over the count table."""
    vals, ca, cb = _two_sample_counts(sf_dir, "view", "purchase")
    na, nb = int(ca.sum()), int(cb.sum())
    gap = np.abs(np.cumsum(ca) * nb - np.cumsum(cb) * na)
    best = int(np.argmax(gap))  # first hit = smallest v on ties
    return pa.table({
        "n_a": pa.array([na], pa.int64()),
        "n_b": pa.array([nb], pa.int64()),
        "d_num": pa.array([int(gap[best])], pa.int64()),
        "ks_at": pa.array([int(vals[best])], pa.int64()),
    })


SQL_EVENTS_KS_STAT = """
WITH ab AS (
  SELECT CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS side,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v
  FROM events WHERE event_type IN ('view', 'purchase')
),
c AS (SELECT side, v, COUNT(*) AS c FROM ab GROUP BY side, v),
m AS (
  SELECT v,
         COALESCE(SUM(CASE WHEN side = 0 THEN c END), 0) AS ca,
         COALESCE(SUM(CASE WHEN side = 1 THEN c END), 0) AS cb
  FROM c GROUP BY v
),
w AS (
  SELECT v,
         SUM(ca) OVER (ORDER BY v) AS cuma,
         SUM(cb) OVER (ORDER BY v) AS cumb
  FROM m
),
tot AS (SELECT SUM(ca) AS n_a, SUM(cb) AS n_b FROM m)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(ABS(cuma * n_b - cumb * n_a) AS BIGINT) AS d_num,
       CAST(v AS BIGINT) AS ks_at
FROM w, tot
ORDER BY ABS(cuma * n_b - cumb * n_a) DESC, v LIMIT 1
"""


def _jfif_synth_batch(batch: pa.Table, with_ref: bool) -> pa.Table:
    """REAL baseline-JPEG fixture (ITU-T T.81 via ``functions/jpeg``):
    block-constant images whose full marker/huffman/IDCT decode path has a
    closed-form integer result — every 8x8 block is constant, so the DCT
    keeps only the DC coefficient and the fixed-point pipeline collapses to
    the documented ``F00 -> dcq -> pixel`` identities the SQL oracle
    replays. Three classes by doc_id%3: 4:4:4 colour (restart markers on),
    4:2:0 neutral-gray (subsampling + replication upsample path), and
    single-component grayscale."""
    from ..functions import codecs
    from ..functions import jpeg as jcodec

    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    blobs, refs, caps = [], [], []
    for i in ids:
        i = int(i)
        cls = i % 3
        if cls == 0:
            bw, bh = 2 + (i // 3) % 3, 2 + (i // 9) % 2
        elif cls == 1:
            bw, bh = 2 * (1 + (i // 3) % 2), 2 * (1 + (i // 6) % 2)
        else:
            bw, bh = 2 + (i // 3) % 3, 1 + (i // 9) % 3
        by, bx = np.mgrid[0:bh, 0:bw]
        if cls == 0:
            r = (i * 37 + bx * 11 + by * 23) % 256
            g = (i * 59 + bx * 17 + by * 13) % 256
            b = (i * 29 + bx * 7 + by * 31) % 256
        elif cls == 1:
            r = g = b = (i * 41 + bx * 19 + by * 29) % 256
        else:
            r = g = b = (i * 43 + bx * 13 + by * 37) % 256
        img = np.repeat(np.repeat(
            np.stack([r, g, b], axis=-1).astype(np.uint8), 8, 0), 8, 1)
        if cls == 0:
            blob = jcodec.encode(img, quality=88, subsampling="444",
                                 restart_interval=3)
        elif cls == 1:
            blob = jcodec.encode(img, quality=88, subsampling="420")
        else:
            blob = jcodec.encode(img[:, :, 0], quality=88)
        blobs.append(blob)
        if with_ref:
            refs.append(codecs.encode_png(img))
            caps.append(f"cap-{i}")
    cols = {"image_id": ids,
            "bytes": pa.array(blobs, type=pa.binary()),
            "fmt": pa.array(["jfif"] * len(ids), type=pa.string())}
    if with_ref:
        cols["ref_bytes"] = pa.array(refs, type=pa.binary())
        cols["caption"] = pa.array(caps, type=pa.string())
    return pa.table(cols)


def q_image_jfif_decode(sf_dir: str):
    """REAL JPEG decode through the actor-pool ``ImageFeaturizer``: fixture
    images are encoded as genuine baseline JFIF streams (markers, Annex-K
    huffman, byte stuffing, restart markers, 4:4:4 + 4:2:0 + grayscale) and
    decoded by the full T.81 huffman + fixed-point-IDCT decoder; the oracle
    replays the closed-form integer arithmetic of the DC-only path. Any
    defect in marker parsing, huffman tables, DC prediction, quantizer,
    IDCT scaling, subsampling or YCbCr conversion breaks the value hash."""
    from ..functions import jpeg as jcodec

    assert int(jcodec.quality_tables(88)[0][0]) == 4  # oracle hard-codes q00
    assert int(jcodec.quality_tables(88)[1][0]) == 4
    docs = _rp(sf_dir, "documents", ["doc_id"])
    synth = docs.map_batches(lambda b: _jfif_synth_batch(b, False),
                             batch_format="pyarrow", batch_size=256)
    feats = mstage.image_features(synth, with_ahash=False, batch_size=256)
    return feats.select_columns(["image_id", "w", "h",
                                 "sum_r", "sum_g", "sum_b"])


def q_image_jfif_roundtrip(sf_dir: str):
    """Per-row image invariant of BASELINE.json over REAL JPEG bytes:
    ``ImageRoundtripChecker`` decodes the JFIF payload and a lossless PNG
    reference, emits the exact integer SSE / max abs error, the pure-integer
    PSNR>=40dB predicate, and caption equality. The oracle replays the
    decode closed form and re-derives SSE per block."""
    docs = _rp(sf_dir, "documents", ["doc_id"])
    synth = docs.map_batches(lambda b: _jfif_synth_batch(b, True),
                             batch_format="pyarrow", batch_size=256)
    checked = mstage.image_roundtrip_check(synth, cap_col="caption",
                                           batch_size=256)
    return checked.select_columns(["image_id", "sse", "max_err",
                                   "ok_40db", "cap_ok"])


# floor-semantics shifts for DuckDB (whose // truncates toward zero): add a
# power-of-two bias so the operand is non-negative, divide, subtract back.
def _fs24(x: str) -> str:  # floor(x / 2^24), |x| < 2^44
    return f"(({x}) + 17592186044416) // 16777216 - 1048576"


def _fs16(x: str) -> str:  # floor(x / 2^16), |x| < 2^36
    return f"(({x}) + 68719476736) // 65536 - 1048576"


def _jfif_f00(c: str) -> str:  # forward DC: F00 = floor-round((c-128)*S0^2/2^24)
    return _fs24(f"(({c}) - 128) * 134189056 + 8388608")


def _jfif_pix(f: str) -> str:  # quantize(q=4) -> dequant -> IDCT DC -> +128
    d = (f"(CASE WHEN {f} >= 0 THEN (2*({f}) + 4) // 8 "
         f"ELSE -((-2*({f}) + 4) // 8) END) * 4")
    return (f"LEAST(255, GREATEST(0, "
            f"{_fs24(f'({d}) * 2096704 + 8388608')} + 128))")


_SQL_JFIF_CORE = """
im AS (
  SELECT doc_id AS image_id, doc_id % 3 AS cls,
         CASE doc_id % 3 WHEN 0 THEN 2 + (doc_id // 3) % 3
                         WHEN 1 THEN 2 * (1 + (doc_id // 3) % 2)
                         ELSE 2 + (doc_id // 3) % 3 END AS bw,
         CASE doc_id % 3 WHEN 0 THEN 2 + (doc_id // 9) % 2
                         WHEN 1 THEN 2 * (1 + (doc_id // 6) % 2)
                         ELSE 1 + (doc_id // 9) % 3 END AS bh
  FROM documents
),
blk AS (
  SELECT image_id, cls, bw, bh, jx.j AS bx, jy.j AS by
  FROM im, (SELECT unnest(range(6)) AS j) jx,
           (SELECT unnest(range(6)) AS j) jy
  WHERE jx.j < bw AND jy.j < bh
),
src AS (
  SELECT *,
    CASE cls WHEN 0 THEN (image_id*37 + bx*11 + by*23) % 256
             WHEN 1 THEN (image_id*41 + bx*19 + by*29) % 256
             ELSE (image_id*43 + bx*13 + by*37) % 256 END AS sr,
    CASE cls WHEN 0 THEN (image_id*59 + bx*17 + by*13) % 256
             WHEN 1 THEN (image_id*41 + bx*19 + by*29) % 256
             ELSE (image_id*43 + bx*13 + by*37) % 256 END AS sg,
    CASE cls WHEN 0 THEN (image_id*29 + bx*7 + by*31) % 256
             WHEN 1 THEN (image_id*41 + bx*19 + by*29) % 256
             ELSE (image_id*43 + bx*13 + by*37) % 256 END AS sb
  FROM blk
),
ycc AS (
  SELECT *,
    CASE WHEN cls = 0
         THEN (19595*sr + 38470*sg + 7471*sb + 32768) // 65536
         ELSE sr END AS cy,
    CASE WHEN cls = 0 THEN ({cb_off}) + 128 ELSE 128 END AS ccb,
    CASE WHEN cls = 0 THEN ({cr_off}) + 128 ELSE 128 END AS ccr
  FROM src
),
f0 AS (
  SELECT *, {f_y} AS fy, {f_cb} AS fcb, {f_cr} AS fcr FROM ycc
),
dpx AS (
  SELECT *, {p_y} AS dy, {p_cb} AS dcb, {p_cr} AS dcr FROM f0
),
rgb AS (
  SELECT image_id, cls, bw, bh, bx, by, sr, sg, sb,
    CASE WHEN cls = 0
         THEN LEAST(255, GREATEST(0, dy + ({r_off}))) ELSE dy END AS rr,
    CASE WHEN cls = 0
         THEN LEAST(255, GREATEST(0, dy - ({g_off}))) ELSE dy END AS gg,
    CASE WHEN cls = 0
         THEN LEAST(255, GREATEST(0, dy + ({b_off}))) ELSE dy END AS bb
  FROM dpx
)
""".format(
    cb_off=_fs16("-11059*sr - 21709*sg + 32768*sb + 32768"),
    cr_off=_fs16("32768*sr - 27439*sg - 5329*sb + 32768"),
    f_y=_jfif_f00("cy"), f_cb=_jfif_f00("ccb"), f_cr=_jfif_f00("ccr"),
    p_y=_jfif_pix("fy"), p_cb=_jfif_pix("fcb"), p_cr=_jfif_pix("fcr"),
    r_off=_fs16("91881*(dcr - 128) + 32768"),
    g_off=_fs16("22554*(dcb - 128) + 46802*(dcr - 128) + 32768"),
    b_off=_fs16("116130*(dcb - 128) + 32768"),
)

SQL_IMAGE_JFIF_DECODE = f"""
WITH {_SQL_JFIF_CORE}
SELECT image_id, CAST(bw*8 AS BIGINT) AS w, CAST(bh*8 AS BIGINT) AS h,
       CAST(SUM(64*rr) AS BIGINT) AS sum_r,
       CAST(SUM(64*gg) AS BIGINT) AS sum_g,
       CAST(SUM(64*bb) AS BIGINT) AS sum_b
FROM rgb GROUP BY image_id, bw, bh
"""

SQL_IMAGE_JFIF_ROUNDTRIP = f"""
WITH {_SQL_JFIF_CORE},
agg AS (
  SELECT image_id, bw, bh,
         SUM(64*((rr-sr)*(rr-sr) + (gg-sg)*(gg-sg)
                 + (bb-sb)*(bb-sb))) AS sse,
         MAX(GREATEST(abs(rr-sr), abs(gg-sg), abs(bb-sb))) AS max_err
  FROM rgb GROUP BY image_id, bw, bh
)
SELECT image_id, CAST(sse AS BIGINT) AS sse,
       CAST(max_err AS BIGINT) AS max_err,
       sse * 10000 <= 65025 * (bw*8) * (bh*8) * 3 AS ok_40db,
       TRUE AS cap_ok
FROM agg
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES = {
    # The driver evaluates only the FIRST 50 registry entries, so the window
    # below is the round's driver-verified set. All registry queries carry
    # exact DuckDB oracles; the ROTATION SCHEDULE (OPERATORS.md) moves tail
    # entries into the window each round so every oracle eventually gets
    # driver verification. Round 5 swaps (per VERDICT.md r4 item 1): in =
    # ten never-driver-checked LLM/graph/spatial flagships (events_asof,
    # doc_dedup_clusters, part_supplier_pagerank, ann_pq_adc, ann_ivfpq,
    # embedding_semantic_dedup, point_dbscan, doc_pack_sequences,
    # doc_decontaminate, image_roundtrip_psnr); out = ten entries
    # driver-green in rounds 2+3+4 whose operator class stays represented
    # in-window (knn_tiles, order_priority_revenue, customers_no_orders,
    # supplier_top_line, doc_token_stats, doc_exact_dedup, embedding_norms,
    # customer_order_rank, traffic_rollup, order_dow_counts).
    "spatial_join_pairs": q_spatial_join_pairs,
    "point_in_polygon": q_point_in_polygon,
    "spatial_tile_stats": q_spatial_tile_stats,
    "segment_raster_cells": q_segment_raster_cells,
    "grid_viewshed": q_grid_viewshed,
    "nation_revenue": q_nation_revenue,
    "order_line_counts": q_order_line_counts,
    "event_window_join": q_event_window_join,
    "segment_union_except": q_segment_union_except,
    "path_linestrings": q_path_linestrings,
    "event_props_parse": q_event_props_parse,
    "doc_tfidf": q_doc_tfidf,
    "ann_topk": q_ann_topk,
    "iterative_match": q_iterative_match,
    "value_distribution": q_value_distribution,
    "embedding_maxsim": q_embedding_maxsim,
    "choose_path_edges": q_choose_path_edges,
    "trip_traversals": q_trip_traversals,
    "trip_seg_traffic": q_trip_seg_traffic,
    "season_pivot_json": q_season_pivot_json,
    "doc_bpe_merges": q_doc_bpe_merges,
    "doc_phash_neardup": q_doc_phash_neardup,
    "events_approx_users": q_events_approx_users,
    "audio_decode_features": q_audio_decode_features,
    "video_frame_means": q_video_frame_means,
    "image_decode_features": q_image_decode_features,
    "trajectory_match_hmm": q_trajectory_match_hmm,
    "path_dijkstra": q_path_dijkstra,
    "shape_rotfrechet": q_shape_rotfrechet,
    "shape_hull": q_shape_hull,
    "shape_line_chunk": q_shape_line_chunk,
    "segment_buffer_pip": q_segment_buffer_pip,
    "choose_path_topk": q_choose_path_topk,
    "doc_minhash_verified": q_doc_minhash_verified,
    "value_quantiles": q_value_quantiles,
    "doc_cap_per_source": q_doc_cap_per_source,
    "events_asof": q_events_asof,
    "doc_dedup_clusters": q_doc_dedup_clusters,
    "part_supplier_pagerank": q_part_supplier_pagerank,
    "ann_pq_adc": q_ann_pq_adc,
    "ann_ivfpq": q_ann_ivfpq,
    "embedding_semantic_dedup": q_embedding_semantic_dedup,
    "point_dbscan": q_point_dbscan,
    "doc_pack_sequences": q_doc_pack_sequences,
    "doc_decontaminate": q_doc_decontaminate,
    "image_roundtrip_psnr": q_image_roundtrip_psnr,
    "image_jfif_decode": q_image_jfif_decode,
    "image_jfif_roundtrip": q_image_jfif_roundtrip,
    "ann_join_sharded": q_ann_join_sharded,
    "ann_join_pq_sharded": q_ann_join_pq_sharded,
    # ---- tail: exact-oracle-backed, outside the 50-entry driver window ----
    "doc_langid": q_doc_langid,
    "doc_containment": q_doc_containment,
    "shape_stats": q_shape_stats,
    "path_sequentiality": q_path_sequentiality,
    "knn_tiles": q_knn_tiles,
    "order_priority_revenue": q_order_priority_revenue,
    "customers_no_orders": q_customers_no_orders,
    "supplier_top_line": q_supplier_top_line,
    "doc_token_stats": q_doc_token_stats,
    "doc_exact_dedup": q_doc_exact_dedup,
    "embedding_norms": q_embedding_norms,
    "customer_order_rank": q_customer_order_rank,
    "traffic_rollup": q_traffic_rollup,
    "order_dow_counts": q_order_dow_counts,
    "spatial_join_pairs_sharded": q_spatial_join_pairs_sharded,
    "cell_point_counts": q_cell_point_counts,
    "pricing_summary": q_pricing_summary,
    "price_rank_topk": q_price_rank_topk,
    "weighted_avg_price": q_weighted_avg_price,
    "feed_extent": q_feed_extent,
    "order_lines_concat": q_order_lines_concat,
    "date_order_counts": q_date_order_counts,
    "events_sessionize": q_events_sessionize,
    "events_distinct_users": q_events_distinct_users,
    "top_orders": q_top_orders,
    "order_suppliers_concat": q_order_suppliers_concat,
    "doc_quality": q_doc_quality,
    "events_tumbling": q_events_tumbling,
    "unit_normalize": q_unit_normalize,
    "time_parse": q_time_parse,
    "row_parity_counts": q_row_parity_counts,
    "season_bucket": q_season_bucket,
    "season_pivot": q_season_pivot,
    "doc_fingerprint": q_doc_fingerprint,
    "doc_simhash": q_doc_simhash,
    "doc_minhash_pairs": q_doc_minhash_pairs,
    "choose_path": q_choose_path,
    "choose_score": q_choose_score,
    "ann_lsh": q_ann_lsh,
    "shape_frechet": q_shape_frechet,
    "shape_hausdorff": q_shape_hausdorff,
    "shape_simplify": q_shape_simplify,
    "shape_slices": q_shape_slices,
    "shape_snap_stats": q_shape_snap_stats,
    "stop_fit": q_stop_fit,
    "shape_bearing_split": q_shape_bearing_split,
    "shape_cospatiality": q_shape_cospatiality,
    "shape_merge_roundtrip": q_shape_merge_roundtrip,
    "rematch_gated": q_rematch_gated,
    "path_metadata_merge": q_path_metadata_merge,
    "choose_annealed": q_choose_annealed,
    "ann_ivf": q_ann_ivf,
    "distinct_flag_status": q_distinct_flag_status,
    "embedding_neardup": q_embedding_neardup,
    "doc_sample": q_doc_sample,
    "doc_ngram_jaccard": q_doc_ngram_jaccard,
    "doc_vocab": q_doc_vocab,
    "doc_repetition": q_doc_repetition,
    "spatial_join_pairs_strtree": q_spatial_join_pairs_strtree,
    "knn_tiles_strtree": q_knn_tiles_strtree,
    "segment_intersections": q_segment_intersections,
    "doc_span_dedup": q_doc_span_dedup,
    "orders_bloom_semi": q_orders_bloom_semi,
    "embedding_kmeans": q_embedding_kmeans,
    "events_funnel": q_events_funnel,
    "events_rolling_sum": q_events_rolling_sum,
    "event_transitions": q_event_transitions,
    "trajectory_route_geometry": q_trajectory_route_geometry,
    "revenue_rollup": q_revenue_rollup,
    "events_time_weighted": q_events_time_weighted,
    "user_activity_islands": q_user_activity_islands,
    "orders_above_customer_avg": q_orders_above_customer_avg,
    "nation_priority_mode": q_nation_priority_mode,
    "embedding_pq_codes": q_embedding_pq_codes,
    "snapshot_upsert": q_snapshot_upsert,
    "user_interval_coverage": q_user_interval_coverage,
    "purchase_attribution": q_purchase_attribution,
    "value_variance_by_type": q_value_variance_by_type,
    "segment_tile_spans": q_segment_tile_spans,
    "hilbert_cells": q_hilbert_cells,
    "doc_normalized_dedup": q_doc_normalized_dedup,
    "doc_pii_scan": q_doc_pii_scan,
    "doc_heavy_hitters": q_doc_heavy_hitters,
    "doc_lm_score": q_doc_lm_score,
    "user_retention_cohorts": q_user_retention_cohorts,
    "events_window_topk": q_events_window_topk,
    "supplier_cooccurrence": q_supplier_cooccurrence,
    "image_edge_energy": q_image_edge_energy,
    "events_ewma": q_events_ewma,
    "tile_coverage_grid": q_tile_coverage_grid,
    "supplier_triangles": q_supplier_triangles,
    "tile_knn_graph": q_tile_knn_graph,
    "orders_skyline": q_orders_skyline,
    "lineitem_profile": q_lineitem_profile,
    "orders_ntile": q_orders_ntile,
    "events_cms": q_events_cms,
    "grid_idw": q_grid_idw,
    "tile_bfs_hops": q_tile_bfs_hops,
    "supplier_kcore": q_supplier_kcore,
    "image_block_stats": q_image_block_stats,
    "stay_points": q_stay_points,
    "image_histogram": q_image_histogram,
    "traj_step_stats": q_traj_step_stats,
    "audio_vad_segments": q_audio_vad_segments,
    "video_shot_segments": q_video_shot_segments,
    "ann_recall": q_ann_recall,
    "grid_moran": q_grid_moran,
    "embedding_knn_classify": q_embedding_knn_classify,
    "quadkey_rollup": q_quadkey_rollup,
    "events_anomaly": q_events_anomaly,
    "lineitem_corr": q_lineitem_corr,
    "doc_chunk_overlap": q_doc_chunk_overlap,
    "tile_link_jaccard": q_tile_link_jaccard,
    "grid_box_blur": q_grid_box_blur,
    "image_filter_stats": q_image_filter_stats,
    "doc_bpe_pairs": q_doc_bpe_pairs,
    "traj_resample": q_traj_resample,
    "image_pixel_dedup": q_image_pixel_dedup,
    "events_rate_limit": q_events_rate_limit,
    "grid_hotspots": q_grid_hotspots,
    "doc_boolean_search": q_doc_boolean_search,
    "snapshot_scd2": q_snapshot_scd2,
    "events_late_arrivals": q_events_late_arrivals,
    "customer_rfm": q_customer_rfm,
    "grid_flow_vectors": q_grid_flow_vectors,
    "traj_od_matrix": q_traj_od_matrix,
    "orders_basket_lift": q_orders_basket_lift,
    "inventory_reconcile": q_inventory_reconcile,
    "events_autocorr": q_events_autocorr,
    "customer_percent_rank": q_customer_percent_rank,
    "geohash_cells": q_geohash_cells,
    "uncovered_points": q_uncovered_points,
    "embedding_quantize_int8": q_embedding_quantize_int8,
    "ann_sq8_topk": q_ann_sq8_topk,
    "events_cusum": q_events_cusum,
    "part_demand_holt": q_part_demand_holt,
    "revenue_cube": q_revenue_cube,
    "grid_slope_aspect": q_grid_slope_aspect,
    "traj_comovement": q_traj_comovement,
    "events_gap_fill": q_events_gap_fill,
    "events_kmv_distinct": q_events_kmv_distinct,
    "doc_edit_distance": q_doc_edit_distance,
    "grid_contours": q_grid_contours,
    "doc_langid_confusion": q_doc_langid_confusion,
    "lineitem_group_median": q_lineitem_group_median,
    "tile_union_area": q_tile_union_area,
    "image_components": q_image_components,
    "embedding_hard_negatives": q_embedding_hard_negatives,
    "shape_dtw": q_shape_dtw,
    "grid_distance_transform": q_grid_distance_transform,
    "doc_readability": q_doc_readability,
    "image_morphology": q_image_morphology,
    "tile_isochrone": q_tile_isochrone,
    "user_type_gini": q_user_type_gini,
    "image_otsu": q_image_otsu,
    "part_hierarchy_rollup": q_part_hierarchy_rollup,
    "supplier_qty_trend": q_supplier_qty_trend,
    "value_mad_by_type": q_value_mad_by_type,
    "image_integral_rects": q_image_integral_rects,
    "audio_pitch_period": q_audio_pitch_period,
    "embedding_gram": q_embedding_gram,
    "image_caption_consistency": q_image_caption_consistency,
    "image_equalize": q_image_equalize,
    "video_motion_estimate": q_video_motion_estimate,
    "doc_collocations": q_doc_collocations,
    "part_abc_classes": q_part_abc_classes,
    "image_wht_energy": q_image_wht_energy,
    "orders_seasonal_index": q_orders_seasonal_index,
    "traj_turn_octants": q_traj_turn_octants,
    "tile_label_propagation": q_tile_label_propagation,
    "image_laplacian_noise": q_image_laplacian_noise,
    "orders_benford_digits": q_orders_benford_digits,
    "grid_heat_diffusion": q_grid_heat_diffusion,
    "image_palette": q_image_palette,
    "part_weighted_sample": q_part_weighted_sample,
    "grid_nearest_site": q_grid_nearest_site,
    "fk_integrity_audit": q_fk_integrity_audit,
    "value_trimmed_mean": q_value_trimmed_mean,
    "supplier_theilsen_trend": q_supplier_theilsen_trend,
    "events_chi2_pieces": q_events_chi2_pieces,
    "doc_bm25": q_doc_bm25,
    "tile_mst": q_tile_mst,
    "image_autocrop": q_image_autocrop,
    "image_downscale_stats": q_image_downscale_stats,
    "image_rle_profile": q_image_rle_profile,
    "points_str_pack": q_points_str_pack,
    "events_mannwhitney": q_events_mannwhitney,
    "events_ks_stat": q_events_ks_stat,
    "image_grad_orientation": q_image_grad_orientation,
    "image_bayer_dither": q_image_bayer_dither,
    "points_quadtree": q_points_quadtree,
    "morton_range_scan": q_morton_range_scan,
    "grid_flow_d8": q_grid_flow_d8,
    "supplier_mann_kendall": q_supplier_mann_kendall,
    "image_seam_energy": q_image_seam_energy,
    "tile_matching": q_tile_matching,
    "embedding_power_iteration": q_embedding_power_iteration,
    "grid_flow_basins": q_grid_flow_basins,
    "events_runs_test": q_events_runs_test,
    "image_upscale_stats": q_image_upscale_stats,
    "image_median_filter": q_image_median_filter,
    "tile_assign_multilevel": q_tile_assign_multilevel,
    "tile_overlap_pairs": q_tile_overlap_pairs,
    "image_glcm_texture": q_image_glcm_texture,
    "user_max_nonoverlap": q_user_max_nonoverlap,
    "image_hough_lines": q_image_hough_lines,
    "image_affine_sample": q_image_affine_sample,
    "lineitem_ols2": q_lineitem_ols2,
    "tile_corridor": q_tile_corridor,
    "traj_gyration": q_traj_gyration,
    "image_fast_corners": q_image_fast_corners,
    "events_range_sum": q_events_range_sum,
    "supplier_bin_packing": q_supplier_bin_packing,
    "shape_visvalingam": q_shape_visvalingam,
    "user_peak_overlap": q_user_peak_overlap,
    "customer_edd_lateness": q_customer_edd_lateness,
    "image_feather_blend": q_image_feather_blend,
    "image_radial_profile": q_image_radial_profile,
    "supplier_knapsack": q_supplier_knapsack,
    "image_kuwahara": q_image_kuwahara,
    "nation_emd_drift": q_nation_emd_drift,
    "tile_nn_tour": q_tile_nn_tour,
    "events_hopping": q_events_hopping,
    "nation_queue_replay": q_nation_queue_replay,
    "part_revenue_gini": q_part_revenue_gini,
    "doc_lz78_complexity": q_doc_lz78_complexity,
    "tile_kcenter": q_tile_kcenter,
    "grid_life_rounds": q_grid_life_rounds,
    "events_max_drawdown": q_events_max_drawdown,
    "doc_min_period": q_doc_min_period,
    "nation_region_transport": q_nation_region_transport,
    "redundant_candidates": q_redundant_candidates,
    "embedding_mmr_rerank": q_embedding_mmr_rerank,
    "embedding_rrf_fusion": q_embedding_rrf_fusion,
    "grid_boxcount": q_grid_boxcount,
    "doc_cdc_chunks": q_doc_cdc_chunks,
    "tile_dominating_set": q_tile_dominating_set,
    "embedding_isotonic": q_embedding_isotonic,
    "traj_alpha_beta": q_traj_alpha_beta,
    "part_ss_policy": q_part_ss_policy,
    "events_peak_prominence": q_events_peak_prominence,
    "grid_pit_fill": q_grid_pit_fill,
    "part_wagner_whitin": q_part_wagner_whitin,
    "grid_semivariogram": q_grid_semivariogram,
    "nation_cvar_pieces": q_nation_cvar_pieces,
    "image_thinning_step": q_image_thinning_step,
    "customer_er_blocking": q_customer_er_blocking,
    "orders_did_pieces": q_orders_did_pieces,
    "image_nms_edges": q_image_nms_edges,
    "events_control_chart": q_events_control_chart,
    "orders_price_index": q_orders_price_index,
    "traj_hampel_outliers": q_traj_hampel_outliers,
    "supplier_kendall_tau": q_supplier_kendall_tau,
    "points_diameter": q_points_diameter,
    "user_burstiness": q_user_burstiness,
    "image_colorfulness": q_image_colorfulness,
    "grid_ripley_k": q_grid_ripley_k,
    "supplier_chao1": q_supplier_chao1,
    "doc_rake_keyphrases": q_doc_rake_keyphrases,
    "image_template_match": q_image_template_match,
    "events_ccf_pieces": q_events_ccf_pieces,
    "part_holt_winters": q_part_holt_winters,
    "part_abc_migration": q_part_abc_migration,
    "events_sax_symbols": q_events_sax_symbols,
    "supplier_friedman_pieces": q_supplier_friedman_pieces,
    "grid_sandpile_rounds": q_grid_sandpile_rounds,
    "nation_rca_index": q_nation_rca_index,
    "doc_porter_stems": q_doc_porter_stems,
    "part_eoq_discrete": q_part_eoq_discrete,
    "events_bollinger_signals": q_events_bollinger_signals,
    "embedding_triplet_check": q_embedding_triplet_check,
    "image_rlsa_smear": q_image_rlsa_smear,
    "tile_hits_rounds": q_tile_hits_rounds,
    "events_df_pieces": q_events_df_pieces,
    "image_skew_detect": q_image_skew_detect,
    "part_croston_pieces": q_part_croston_pieces,
    "tile_modularity_pieces": q_tile_modularity_pieces,
    "doc_word_burstiness": q_doc_word_burstiness,
    "customer_km_table": q_customer_km_table,
    "doc_texttiling": q_doc_texttiling,
    "tile_clarke_wright": q_tile_clarke_wright,
    "nation_supplier_hhi": q_nation_supplier_hhi,
    "events_regime_viterbi": q_events_regime_viterbi,
    "embedding_ndcg5": q_embedding_ndcg5,
}


ORACLE_SQL = {
    "image_jfif_decode": SQL_IMAGE_JFIF_DECODE,
    "image_jfif_roundtrip": SQL_IMAGE_JFIF_ROUNDTRIP,
    "spatial_join_pairs": SQL_SPATIAL_JOIN_PAIRS,
    "spatial_tile_stats": SQL_SPATIAL_TILE_STATS,
    "knn_tiles": SQL_KNN_TILES,
    "tile_assign_multilevel": SQL_TILE_ASSIGN,
    "tile_overlap_pairs": SQL_TILE_OVERLAP,
    "cell_point_counts": SQL_CELL_COUNTS,
    "pricing_summary": SQL_PRICING_SUMMARY,
    "order_priority_revenue": SQL_ORDER_PRIORITY_REVENUE,
    "nation_revenue": SQL_NATION_REVENUE,
    "order_line_counts": SQL_ORDER_LINE_COUNTS,
    "customers_no_orders": SQL_CUSTOMERS_NO_ORDERS,
    "event_window_join": SQL_EVENT_WINDOW_JOIN,
    "price_rank_topk": SQL_PRICE_RANK_TOPK,
    "supplier_top_line": SQL_SUPPLIER_TOP_LINE,
    "top_orders": SQL_TOP_ORDERS,
    "segment_union_except": SQL_SEGMENT_UNION_EXCEPT,
    "distinct_flag_status": SQL_DISTINCT_FLAG_STATUS,
    "weighted_avg_price": SQL_WEIGHTED_AVG_PRICE,
    "season_bucket": SQL_SEASON_BUCKET,
    "feed_extent": SQL_FEED_EXTENT,
    "order_lines_concat": SQL_ORDER_LINES_CONCAT,
    "order_suppliers_concat": SQL_ORDER_SUPPLIERS_CONCAT,
    "date_order_counts": SQL_DATE_ORDER_COUNTS,
    "events_sessionize": SQL_EVENTS_SESSIONIZE,
    "events_tumbling": SQL_EVENTS_TUMBLING,
    "events_distinct_users": SQL_EVENTS_DISTINCT_USERS,
    "event_props_parse": SQL_EVENT_PROPS_PARSE,
    "doc_token_stats": SQL_DOC_TOKEN_STATS,
    "doc_quality": SQL_DOC_QUALITY,
    "doc_exact_dedup": SQL_DOC_EXACT_DEDUP,
    "ann_topk": SQL_ANN_TOPK,
    "embedding_norms": SQL_EMBEDDING_NORMS,
    "iterative_match": SQL_ITERATIVE_MATCH,
    "value_distribution": SQL_VALUE_DISTRIBUTION,
    "season_pivot": SQL_SEASON_PIVOT,
    "customer_order_rank": SQL_CUSTOMER_ORDER_RANK,
    "traffic_rollup": SQL_TRAFFIC_ROLLUP,
    "row_parity_counts": SQL_ROW_PARITY_COUNTS,
    "unit_normalize": SQL_UNIT_NORMALIZE,
    "redundant_candidates": SQL_REDUNDANT_CANDIDATES,
    "order_dow_counts": SQL_ORDER_DOW_COUNTS,
    "shape_stats": SQL_SHAPE_STATS,
    "choose_path_edges": SQL_CHOOSE_PATH_EDGES,
    "path_sequentiality": SQL_PATH_SEQUENTIALITY,
    "trip_traversals": SQL_TRIP_TRAVERSALS,
    "trip_seg_traffic": SQL_TRIP_SEG_TRAFFIC,
    "season_pivot_json": SQL_SEASON_PIVOT_JSON,
    "doc_containment": SQL_DOC_CONTAINMENT,
    "time_parse": SQL_TIME_PARSE,
    "doc_langid": SQL_DOC_LANGID.replace("__PROFILES__", _langid_profile_values()),
    "events_hopping": SQL_EVENTS_HOPPING,
    "doc_simhash": SQL_DOC_SIMHASH,
    "doc_fingerprint": SQL_DOC_FINGERPRINT,
    "doc_minhash_pairs": SQL_DOC_MINHASH_PAIRS,
    "doc_minhash_verified": SQL_DOC_MINHASH_VERIFIED,
    "doc_phash_neardup": SQL_DOC_PHASH_NEARDUP,
    "events_approx_users": SQL_EVENTS_APPROX_USERS,
    "ann_lsh": SQL_ANN_LSH,
    "ann_ivf": SQL_ANN_IVF,
    "ann_join_sharded": SQL_ANN_IVF,
    "ann_join_pq_sharded": SQL_ANN_IVFPQ,
    "embedding_neardup": SQL_EMBEDDING_NEARDUP,
    "shape_frechet": SQL_SHAPE_FRECHET,
    "shape_rotfrechet": SQL_SHAPE_ROTFRECHET,
    "shape_hull": SQL_SHAPE_HULL,
    "shape_line_chunk": SQL_SHAPE_LINE_CHUNK,
    "segment_buffer_pip": SQL_SEGMENT_BUFFER_PIP,
    "shape_hausdorff": SQL_SHAPE_HAUSDORFF,
    "shape_simplify": SQL_SHAPE_SIMPLIFY,
    "shape_slices": SQL_SHAPE_SLICES,
    "shape_snap_stats": SQL_SHAPE_SNAP_STATS,
    "shape_bearing_split": SQL_SHAPE_BEARING_SPLIT,
    "shape_cospatiality": SQL_SHAPE_COSPATIALITY,
    "stop_fit": SQL_STOP_FIT,
    "choose_path": SQL_CHOOSE_PATH,
    "trajectory_match_hmm": SQL_TRAJECTORY_MATCH_HMM,
    "path_dijkstra": SQL_PATH_DIJKSTRA,
    "choose_score": SQL_CHOOSE_SCORE,
    "choose_path_topk": SQL_CHOOSE_PATH_TOPK,
    "value_quantiles": SQL_VALUE_QUANTILES,
    "choose_annealed": SQL_CHOOSE_ANNEALED,
    "path_metadata_merge": SQL_PATH_METADATA_MERGE,
    "path_linestrings": SQL_PATH_LINESTRINGS,
    "rematch_gated": SQL_REMATCH_GATED,
    "events_asof": SQL_EVENTS_ASOF,
    "doc_sample": SQL_DOC_SAMPLE,
    "doc_ngram_jaccard": SQL_DOC_NGRAM_JACCARD,
    "doc_vocab": SQL_DOC_VOCAB,
    "doc_repetition": SQL_DOC_REPETITION,
    "doc_cap_per_source": SQL_DOC_CAP_PER_SOURCE,
    "audio_decode_features": SQL_AUDIO_DECODE_FEATURES,
    "video_frame_means": SQL_VIDEO_FRAME_MEANS,
    "shape_merge_roundtrip": SQL_SHAPE_MERGE_ROUNDTRIP,
    "point_in_polygon": SQL_POINT_IN_POLYGON,
    "doc_tfidf": SQL_DOC_TFIDF,
    "image_decode_features": SQL_IMAGE_DECODE_FEATURES,
    # identical semantics (and SQL) to the unsharded join — the query differs
    # only in the Ray execution path (x-range-sharded reference side)
    "spatial_join_pairs_sharded": SQL_SPATIAL_JOIN_PAIRS,
    # identical semantics through the STR R-tree backend (state/strtree.py)
    "spatial_join_pairs_strtree": SQL_SPATIAL_JOIN_PAIRS,
    "knn_tiles_strtree": SQL_KNN_TILES,
    "doc_dedup_clusters": SQL_DOC_DEDUP_CLUSTERS,
    "segment_intersections": SQL_SEGMENT_INTERSECTIONS,
    "doc_span_dedup": SQL_DOC_SPAN_DEDUP,
    "orders_bloom_semi": SQL_ORDERS_BLOOM_SEMI,
    "embedding_kmeans": SQL_EMBEDDING_KMEANS,
    "part_supplier_pagerank": SQL_PART_SUPPLIER_PAGERANK,
    "events_funnel": SQL_EVENTS_FUNNEL,
    "events_rolling_sum": SQL_EVENTS_ROLLING_SUM,
    "event_transitions": SQL_EVENT_TRANSITIONS,
    "trajectory_route_geometry": SQL_TRAJECTORY_ROUTE_GEOMETRY,
    "revenue_rollup": SQL_REVENUE_ROLLUP,
    "events_time_weighted": SQL_EVENTS_TIME_WEIGHTED,
    "user_activity_islands": SQL_USER_ACTIVITY_ISLANDS,
    "orders_above_customer_avg": SQL_ORDERS_ABOVE_CUSTOMER_AVG,
    "nation_priority_mode": SQL_NATION_PRIORITY_MODE,
    "embedding_pq_codes": SQL_EMBEDDING_PQ_CODES,
    "ann_pq_adc": SQL_ANN_PQ_ADC,
    "ann_ivfpq": SQL_ANN_IVFPQ,
    "snapshot_upsert": SQL_SNAPSHOT_UPSERT,
    "user_interval_coverage": SQL_USER_INTERVAL_COVERAGE,
    "purchase_attribution": SQL_PURCHASE_ATTRIBUTION,
    "value_variance_by_type": SQL_VALUE_VARIANCE_BY_TYPE,
    "segment_tile_spans": SQL_SEGMENT_TILE_SPANS,
    "hilbert_cells": SQL_HILBERT_CELLS,
    "doc_normalized_dedup": SQL_DOC_NORMALIZED_DEDUP,
    "doc_pii_scan": SQL_DOC_PII_SCAN,
    "doc_heavy_hitters": SQL_DOC_HEAVY_HITTERS,
    "doc_lm_score": SQL_DOC_LM_SCORE,
    "embedding_semantic_dedup": SQL_EMBEDDING_SEMANTIC_DEDUP,
    "user_retention_cohorts": SQL_USER_RETENTION_COHORTS,
    "events_window_topk": SQL_EVENTS_WINDOW_TOPK,
    "supplier_cooccurrence": SQL_SUPPLIER_COOCCURRENCE,
    "image_edge_energy": SQL_IMAGE_EDGE_ENERGY,
    "events_ewma": SQL_EVENTS_EWMA,
    "tile_coverage_grid": SQL_TILE_COVERAGE_GRID,
    "supplier_triangles": SQL_SUPPLIER_TRIANGLES,
    "tile_knn_graph": SQL_TILE_KNN_GRAPH,
    "orders_skyline": SQL_ORDERS_SKYLINE,
    "lineitem_profile": SQL_LINEITEM_PROFILE,
    "point_dbscan": SQL_POINT_DBSCAN,
    "orders_ntile": SQL_ORDERS_NTILE,
    "events_cms": SQL_EVENTS_CMS,
    "grid_idw": SQL_GRID_IDW,
    "tile_bfs_hops": SQL_TILE_BFS_HOPS,
    "supplier_kcore": SQL_SUPPLIER_KCORE,
    "image_block_stats": SQL_IMAGE_BLOCK_STATS,
    "stay_points": SQL_STAY_POINTS,
    "doc_pack_sequences": SQL_DOC_PACK_SEQUENCES,
    "image_histogram": SQL_IMAGE_HISTOGRAM,
    "traj_step_stats": SQL_TRAJ_STEP_STATS,
    "audio_vad_segments": SQL_AUDIO_VAD_SEGMENTS,
    "video_shot_segments": SQL_VIDEO_SHOT_SEGMENTS,
    "doc_decontaminate": SQL_DOC_DECONTAMINATE,
    "ann_recall": SQL_ANN_RECALL,
    "grid_moran": SQL_GRID_MORAN,
    "image_roundtrip_psnr": SQL_IMAGE_ROUNDTRIP_PSNR,
    "embedding_knn_classify": SQL_EMBEDDING_KNN_CLASSIFY,
    "quadkey_rollup": SQL_QUADKEY_ROLLUP,
    "events_anomaly": SQL_EVENTS_ANOMALY,
    "lineitem_corr": SQL_LINEITEM_CORR,
    "doc_chunk_overlap": SQL_DOC_CHUNK_OVERLAP,
    "tile_link_jaccard": SQL_TILE_LINK_JACCARD,
    "grid_box_blur": SQL_GRID_BOX_BLUR,
    "image_filter_stats": SQL_IMAGE_FILTER_STATS,
    "doc_bpe_pairs": SQL_DOC_BPE_PAIRS,
    "traj_resample": SQL_TRAJ_RESAMPLE,
    "image_pixel_dedup": SQL_IMAGE_PIXEL_DEDUP,
    "events_rate_limit": SQL_EVENTS_RATE_LIMIT,
    "grid_hotspots": SQL_GRID_HOTSPOTS,
    "doc_boolean_search": SQL_DOC_BOOLEAN_SEARCH,
    "snapshot_scd2": SQL_SNAPSHOT_SCD2,
    "events_late_arrivals": SQL_EVENTS_LATE_ARRIVALS,
    "customer_rfm": SQL_CUSTOMER_RFM,
    "grid_flow_vectors": SQL_GRID_FLOW_VECTORS,
    "traj_od_matrix": SQL_TRAJ_OD_MATRIX,
    "orders_basket_lift": SQL_ORDERS_BASKET_LIFT,
    "inventory_reconcile": SQL_INVENTORY_RECONCILE,
    "events_autocorr": SQL_EVENTS_AUTOCORR,
    "customer_percent_rank": SQL_CUSTOMER_PERCENT_RANK,
    "geohash_cells": SQL_GEOHASH_CELLS,
    "uncovered_points": SQL_UNCOVERED_POINTS,
    "embedding_quantize_int8": SQL_EMBEDDING_QUANTIZE,
    "ann_sq8_topk": SQL_ANN_SQ8_TOPK,
    "events_cusum": SQL_EVENTS_CUSUM,
    "part_demand_holt": SQL_PART_DEMAND_HOLT,
    "revenue_cube": SQL_REVENUE_CUBE,
    "grid_slope_aspect": SQL_GRID_SLOPE_ASPECT,
    "traj_comovement": SQL_TRAJ_COMOVEMENT,
    "events_gap_fill": SQL_EVENTS_GAP_FILL,
    "events_kmv_distinct": SQL_EVENTS_KMV_DISTINCT,
    "doc_edit_distance": SQL_DOC_EDIT_DISTANCE,
    "grid_contours": SQL_GRID_CONTOURS,
    "doc_langid_confusion": SQL_DOC_LANGID_CONFUSION.replace(
        "__LANGID__", SQL_DOC_LANGID.replace(
            "__PROFILES__", _langid_profile_values())),
    "lineitem_group_median": SQL_LINEITEM_GROUP_MEDIAN,
    "tile_union_area": SQL_TILE_UNION_AREA,
    "image_components": SQL_IMAGE_COMPONENTS,
    "embedding_hard_negatives": SQL_EMBEDDING_HARD_NEGATIVES,
    "shape_dtw": SQL_SHAPE_DTW,
    "grid_distance_transform": SQL_GRID_DISTANCE_TRANSFORM,
    "doc_readability": SQL_DOC_READABILITY,
    "image_morphology": SQL_IMAGE_MORPHOLOGY,
    "tile_isochrone": SQL_TILE_ISOCHRONE,
    "user_type_gini": SQL_USER_TYPE_GINI,
    "image_otsu": SQL_IMAGE_OTSU,
    "part_hierarchy_rollup": SQL_PART_HIERARCHY_ROLLUP,
    "supplier_qty_trend": SQL_SUPPLIER_QTY_TREND,
    "value_mad_by_type": SQL_VALUE_MAD_BY_TYPE,
    "image_integral_rects": SQL_IMAGE_INTEGRAL_RECTS,
    "audio_pitch_period": SQL_AUDIO_PITCH_PERIOD,
    "embedding_gram": SQL_EMBEDDING_GRAM,
    "image_caption_consistency": SQL_IMAGE_CAPTION_CONSISTENCY,
    "image_equalize": SQL_IMAGE_EQUALIZE,
    "video_motion_estimate": SQL_VIDEO_MOTION_ESTIMATE,
    "doc_collocations": SQL_DOC_COLLOCATIONS,
    "part_abc_classes": SQL_PART_ABC_CLASSES,
    "image_wht_energy": SQL_IMAGE_WHT_ENERGY,
    "orders_seasonal_index": SQL_ORDERS_SEASONAL_INDEX,
    "traj_turn_octants": SQL_TRAJ_TURN_OCTANTS,
    "tile_label_propagation": SQL_TILE_LABEL_PROPAGATION,
    "image_laplacian_noise": SQL_IMAGE_LAPLACIAN_NOISE,
    "orders_benford_digits": SQL_ORDERS_BENFORD_DIGITS,
    "grid_heat_diffusion": SQL_GRID_HEAT_DIFFUSION,
    "image_palette": SQL_IMAGE_PALETTE,
    "part_weighted_sample": SQL_PART_WEIGHTED_SAMPLE,
    "grid_nearest_site": SQL_GRID_NEAREST_SITE,
    "fk_integrity_audit": SQL_FK_INTEGRITY_AUDIT,
    "value_trimmed_mean": SQL_VALUE_TRIMMED_MEAN,
    "supplier_theilsen_trend": SQL_SUPPLIER_THEILSEN_TREND,
    "events_chi2_pieces": SQL_EVENTS_CHI2_PIECES,
    "doc_bm25": SQL_DOC_BM25,
    "tile_mst": SQL_TILE_MST,
    "image_autocrop": SQL_IMAGE_AUTOCROP,
    "image_downscale_stats": SQL_IMAGE_DOWNSCALE_STATS,
    "image_rle_profile": SQL_IMAGE_RLE_PROFILE,
    "points_str_pack": SQL_POINTS_STR_PACK,
    "events_mannwhitney": SQL_EVENTS_MANNWHITNEY,
    "events_ks_stat": SQL_EVENTS_KS_STAT,
    "image_grad_orientation": SQL_IMAGE_GRAD_ORIENTATION,
    "image_bayer_dither": SQL_IMAGE_BAYER_DITHER,
    "points_quadtree": SQL_POINTS_QUADTREE,
    "morton_range_scan": SQL_MORTON_RANGE_SCAN,
    "grid_flow_d8": SQL_GRID_FLOW_D8,
    "supplier_mann_kendall": SQL_SUPPLIER_MANN_KENDALL,
    "image_seam_energy": SQL_IMAGE_SEAM_ENERGY,
    "tile_matching": SQL_TILE_MATCHING,
    "embedding_power_iteration": SQL_EMBEDDING_POWER_ITERATION,
    "grid_flow_basins": SQL_GRID_FLOW_BASINS,
    "events_runs_test": SQL_EVENTS_RUNS_TEST,
    "image_upscale_stats": SQL_IMAGE_UPSCALE_STATS,
    "image_median_filter": SQL_IMAGE_MEDIAN_FILTER,
    "segment_raster_cells": SQL_SEGMENT_RASTER_CELLS,
    "image_glcm_texture": SQL_IMAGE_GLCM_TEXTURE,
    "grid_viewshed": SQL_GRID_VIEWSHED,
    "user_max_nonoverlap": SQL_USER_MAX_NONOVERLAP,
    "image_hough_lines": SQL_IMAGE_HOUGH_LINES,
    "image_affine_sample": SQL_IMAGE_AFFINE_SAMPLE,
    "lineitem_ols2": SQL_LINEITEM_OLS2,
    "tile_corridor": SQL_TILE_CORRIDOR,
    "traj_gyration": SQL_TRAJ_GYRATION,
    "image_fast_corners": SQL_IMAGE_FAST_CORNERS,
    "events_range_sum": SQL_EVENTS_RANGE_SUM,
    "supplier_bin_packing": SQL_SUPPLIER_BIN_PACKING,
    "shape_visvalingam": SQL_SHAPE_VISVALINGAM,
    "user_peak_overlap": SQL_USER_PEAK_OVERLAP,
    "customer_edd_lateness": SQL_CUSTOMER_EDD_LATENESS,
    "image_feather_blend": SQL_IMAGE_FEATHER_BLEND,
    "image_radial_profile": SQL_IMAGE_RADIAL_PROFILE,
    "supplier_knapsack": SQL_SUPPLIER_KNAPSACK,
    "image_kuwahara": SQL_IMAGE_KUWAHARA,
    "nation_emd_drift": SQL_NATION_EMD_DRIFT,
    "tile_nn_tour": SQL_TILE_NN_TOUR,
    "doc_bpe_merges": SQL_DOC_BPE_MERGES,
    "nation_queue_replay": SQL_NATION_QUEUE_REPLAY,
    "part_revenue_gini": SQL_PART_REVENUE_GINI,
    "doc_lz78_complexity": SQL_DOC_LZ78_COMPLEXITY,
    "tile_kcenter": SQL_TILE_KCENTER,
    "grid_life_rounds": SQL_GRID_LIFE_ROUNDS,
    "events_max_drawdown": SQL_EVENTS_MAX_DRAWDOWN,
    "doc_min_period": SQL_DOC_MIN_PERIOD,
    "nation_region_transport": SQL_NATION_REGION_TRANSPORT,
    "embedding_maxsim": SQL_EMBEDDING_MAXSIM,
    "embedding_mmr_rerank": SQL_EMBEDDING_MMR_RERANK,
    "embedding_rrf_fusion": SQL_EMBEDDING_RRF_FUSION,
    "grid_boxcount": SQL_GRID_BOXCOUNT,
    "doc_cdc_chunks": SQL_DOC_CDC_CHUNKS,
    "tile_dominating_set": SQL_TILE_DOMINATING_SET,
    "embedding_isotonic": SQL_EMBEDDING_ISOTONIC,
    "traj_alpha_beta": SQL_TRAJ_ALPHA_BETA,
    "part_ss_policy": SQL_PART_SS_POLICY,
    "events_peak_prominence": SQL_EVENTS_PEAK_PROMINENCE,
    "grid_pit_fill": SQL_GRID_PIT_FILL,
    "part_wagner_whitin": SQL_PART_WAGNER_WHITIN,
    "grid_semivariogram": SQL_GRID_SEMIVARIOGRAM,
    "nation_cvar_pieces": SQL_NATION_CVAR_PIECES,
    "image_thinning_step": SQL_IMAGE_THINNING_STEP,
    "customer_er_blocking": SQL_CUSTOMER_ER_BLOCKING,
    "orders_did_pieces": SQL_ORDERS_DID_PIECES,
    "image_nms_edges": SQL_IMAGE_NMS_EDGES,
    "events_control_chart": SQL_EVENTS_CONTROL_CHART,
    "orders_price_index": SQL_ORDERS_PRICE_INDEX,
    "traj_hampel_outliers": SQL_TRAJ_HAMPEL_OUTLIERS,
    "supplier_kendall_tau": SQL_SUPPLIER_KENDALL_TAU,
    "points_diameter": SQL_POINTS_DIAMETER,
    "user_burstiness": SQL_USER_BURSTINESS,
    "image_colorfulness": SQL_IMAGE_COLORFULNESS,
    "grid_ripley_k": SQL_GRID_RIPLEY_K,
    "supplier_chao1": SQL_SUPPLIER_CHAO1,
    "doc_rake_keyphrases": SQL_DOC_RAKE_KEYPHRASES,
    "image_template_match": SQL_IMAGE_TEMPLATE_MATCH,
    "events_ccf_pieces": SQL_EVENTS_CCF_PIECES,
    "part_holt_winters": SQL_PART_HOLT_WINTERS,
    "part_abc_migration": SQL_PART_ABC_MIGRATION,
    "events_sax_symbols": SQL_EVENTS_SAX_SYMBOLS,
    "supplier_friedman_pieces": SQL_SUPPLIER_FRIEDMAN_PIECES,
    "grid_sandpile_rounds": SQL_GRID_SANDPILE_ROUNDS,
    "nation_rca_index": SQL_NATION_RCA_INDEX,
    "doc_porter_stems": SQL_DOC_PORTER_STEMS,
    "part_eoq_discrete": SQL_PART_EOQ_DISCRETE,
    "events_bollinger_signals": SQL_EVENTS_BOLLINGER_SIGNALS,
    "embedding_triplet_check": SQL_EMBEDDING_TRIPLET_CHECK,
    "image_rlsa_smear": SQL_IMAGE_RLSA_SMEAR,
    "tile_hits_rounds": SQL_TILE_HITS_ROUNDS,
    "events_df_pieces": SQL_EVENTS_DF_PIECES,
    "image_skew_detect": SQL_IMAGE_SKEW_DETECT,
    "part_croston_pieces": SQL_PART_CROSTON_PIECES,
    "tile_modularity_pieces": SQL_TILE_MODULARITY_PIECES,
    "doc_word_burstiness": SQL_DOC_WORD_BURSTINESS,
    "customer_km_table": SQL_CUSTOMER_KM_TABLE,
    "doc_texttiling": SQL_DOC_TEXTTILING,
    "tile_clarke_wright": SQL_TILE_CLARKE_WRIGHT,
    "nation_supplier_hhi": SQL_NATION_SUPPLIER_HHI,
    "events_regime_viterbi": SQL_EVENTS_REGIME_VITERBI,
    "embedding_ndcg5": SQL_EMBEDDING_NDCG5,
}
