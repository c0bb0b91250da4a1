"""Z-order layout: per-file envelopes must cover small boxes of the
2-D space (vs the near-total coverage of an unclustered layout), and a
box query must prune most files by footer stats alone."""

import pytest
from pyspark.sql import functions as F

from lanterndb_spark.sources.zorder import file_boxes, zorder_write


@pytest.fixture(scope="module")
def laid_out(spark, tmp_path_factory):
    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("event_id", "user_id", "value")
    )
    base = tmp_path_factory.mktemp("zorder")
    zpath, npath = str(base / "z"), str(base / "naive")
    zorder_write(ev, zpath, ["user_id", "value"], bits=12, files=16)
    ev.repartition(16).write.mode("overwrite").parquet(npath)
    stats = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()
    return spark, zpath, npath, stats, ev


def _areas(path, stats):
    u_span = (stats[1] - stats[0]) or 1
    v_span = (stats[3] - stats[2]) or 1
    out = []
    for b in file_boxes(path, ["user_id", "value"]):
        (ulo, uhi), (vlo, vhi) = b["user_id"], b["value"]
        out.append(((uhi - ulo) / u_span) * ((vhi - vlo) / v_span))
    return out


def test_zorder_files_cover_small_boxes(laid_out):
    _, zpath, npath, stats, _ = laid_out
    z_area = sum(_areas(zpath, stats)) / len(_areas(zpath, stats))
    n_area = sum(_areas(npath, stats)) / len(_areas(npath, stats))
    # unclustered round-robin files span most of the space (the skewed
    # value distribution keeps the normalized span below 1); z-ordered
    # files must average several times tighter
    assert n_area > 0.4
    assert z_area < 0.3 * n_area


def test_box_query_prunes_files_by_stats(laid_out):
    _, zpath, npath, stats, _ = laid_out
    # a small box in both dimensions: middle 10% of users x low values
    ulo = stats[0] + 0.45 * (stats[1] - stats[0])
    uhi = stats[0] + 0.55 * (stats[1] - stats[0])
    vlo, vhi = stats[2], stats[2] + 0.1 * (stats[3] - stats[2])

    def hit_fraction(path):
        boxes = file_boxes(path, ["user_id", "value"])
        hits = sum(
            1 for b in boxes
            if not (b["user_id"][1] < ulo or b["user_id"][0] > uhi
                    or b["value"][1] < vlo or b["value"][0] > vhi)
        )
        return hits / len(boxes)

    assert hit_fraction(npath) == 1.0          # naive layout: every file hit
    assert hit_fraction(zpath) <= 0.5          # z-order: most files pruned


def test_zorder_preserves_rows(laid_out):
    spark, zpath, _, _, ev = laid_out
    back = spark.read.parquet(zpath)
    assert back.count() == ev.count()
    assert back.agg(F.sum("event_id")).first()[0] == ev.agg(F.sum("event_id")).first()[0]


def test_zorder_rejects_bad_arity(laid_out):
    spark, _, _, _, ev = laid_out
    with pytest.raises(ValueError):
        zorder_write(ev, "/tmp/never", ["user_id"], files=2)


def test_zvalue_monotone_per_dimension(spark):
    """With the other coordinate fixed, the z-value must preserve each
    dimension's order (bit interleaving keeps per-dim bit positions)."""
    from lanterndb_spark.sources.zorder import zvalue

    rows = [(x, y) for x in range(0, 64, 7) for y in range(0, 64, 11)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", zvalue([F.col("x"), F.col("y")], bits=6).alias("z")
        ).collect()
    }
    xs = sorted({x for x, _ in got})
    ys = sorted({y for _, y in got})
    for y in ys:
        zs = [got[(x, y)] for x in xs]
        assert zs == sorted(zs)
    for x in xs:
        zs = [got[(x, y)] for y in ys]
        assert zs == sorted(zs)
