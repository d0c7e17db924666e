"""S9 tiered/remote log storage.

Reference semantics (not implementation):
  - server/log/remote/LogTieringTask.java — sealed segments are copied
    to remote storage, local copies beyond
    `table.log.tiered.local-segments` (ConfigOptions.java:1822-1828,
    default 2) are trimmed, expired remote segments are deleted.
  - client/.../scanner/log/RemoteLogDownloader.java — reads below the
    local log start are served from the remote tier.
Here the remote tier is a second Parquet root under the table dir and
scans/streams union both tiers, so every reader keeps seeing the full
offset range with no download step.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fluss_spark.catalog import Catalog
from fluss_spark.maintenance import compact_log, expire_log_ttl, tier_log
from fluss_spark.table import create_table
from fluss_spark.types import Field, TableSchema


@pytest.fixture()
def catalog(tmp_path):
    return Catalog(str(tmp_path / "wh"))


def _mk_log(catalog, name, props=None, buckets=2):
    t = create_table(
        catalog, "db", name,
        TableSchema(
            fields=[Field("a", "INT"), Field("b", "STRING")],
            num_buckets=buckets,
            properties=props or {},
        ),
    )
    return t


def _commit_dirs(d):
    if not os.path.isdir(d):
        return []
    return sorted(e.name for e in os.scandir(d) if e.name.startswith("__commit="))


def test_tier_log_moves_sealed_commits_and_scan_unions(spark, catalog):
    t = _mk_log(catalog, "tiered")
    for i in range(6):
        t.append(spark.createDataFrame([(i, f"v{i}"), (100 + i, f"w{i}")], "a int, b string"),
                 ordering=["a"])
    before = sorted(map(tuple, t.scan(spark).select("a", "b", "__bucket", "__offset").collect()))
    moved = tier_log(t, local_segments=2)
    assert moved == 4
    assert len(_commit_dirs(t.log.log_dir)) == 2
    assert len(_commit_dirs(t.log.remote_dir)) == 4
    after = sorted(map(tuple, t.scan(spark).select("a", "b", "__bucket", "__offset").collect()))
    assert before == after  # union read: same rows, same offsets
    # metadata count and offsets are state-based — unaffected by tiering
    assert t.count() == 12
    # re-tiering is idempotent when nothing new sealed
    assert tier_log(t, local_segments=2) == 0


def test_tiered_appends_and_offsets_continue(spark, catalog):
    t = _mk_log(catalog, "tiered_append")
    for i in range(4):
        t.append(spark.createDataFrame([(i, "x")], "a int, b string"), ordering=["a"])
    tier_log(t, local_segments=1)
    t.append(spark.createDataFrame([(9, "post")], "a int, b string"), ordering=["a"])
    rows = t.scan(spark).select("a", "__bucket", "__offset").collect()
    assert len(rows) == 5
    # offsets stay dense per bucket across the tier boundary
    per_bucket: dict[int, list[int]] = {}
    for r in rows:
        per_bucket.setdefault(r["__bucket"], []).append(r["__offset"])
    for offs in per_bucket.values():
        assert sorted(offs) == list(range(len(offs)))


def test_time_travel_and_timestamp_offsets_span_tiers(spark, catalog):
    t = _mk_log(catalog, "tiered_tt")
    states = []
    for i in range(4):
        states.append(
            t.append(spark.createDataFrame([(i, "x")], "a int, b string"), ordering=["a"])
        )
    tier_log(t, local_segments=1)
    # as-of a commit whose data now lives wholly in the remote tier
    early = t.log.scan(spark, as_of_commit=states[1].version)
    assert sorted(r["a"] for r in early.collect()) == [0, 1]
    # timestamp → offset resolution scans both tiers
    offs = t.log.offsets_for_timestamp(spark, 0)
    assert offs == t.log.earliest_offsets()


def test_auto_tiering_on_append_path(spark, catalog):
    t = _mk_log(catalog, "auto_tiered",
        props={"table.log.tiered.enable": "true", "table.log.tiered.local-segments": "2"},
    )
    for i in range(5):
        t.append(spark.createDataFrame([(i, "x")], "a int, b string"), ordering=["a"])
    assert len(_commit_dirs(t.log.log_dir)) == 2
    assert len(_commit_dirs(t.log.remote_dir)) == 3
    assert t.scan(spark).count() == 5


def test_compaction_leaves_remote_tier_untouched(spark, catalog):
    t = _mk_log(catalog, "tiered_compact")
    for i in range(8):
        t.append(spark.createDataFrame([(i, "x")], "a int, b string"), ordering=["a"])
    tier_log(t, local_segments=4)
    remote_before = _commit_dirs(t.log.remote_dir)
    n = compact_log(t, spark, target_commits=4)
    assert n == 4  # only the 4 local dirs compacted
    assert _commit_dirs(t.log.remote_dir) == remote_before
    assert sorted(r["a"] for r in t.scan(spark).collect()) == list(range(8))


def test_ttl_expires_remote_segments(spark, catalog):
    t = _mk_log(catalog, "tiered_ttl", props={"table.log.ttl": "1d"})
    for i in range(4):
        t.append(spark.createDataFrame([(i, "x")], "a int, b string"), ordering=["a"])
    tier_log(t, local_segments=1)
    assert len(_commit_dirs(t.log.remote_dir)) == 3
    # "now" far in the future: everything but the newest commit expires
    far_future = t.catalog.current_commit("db", "tiered_ttl").ts_ms + 10 * 86400_000
    deleted = expire_log_ttl(t, spark, now_ms=far_future)
    assert deleted == 3
    assert len(_commit_dirs(t.log.remote_dir)) == 0
    # earliest offsets advanced; metadata count matches the surviving rows
    remaining = t.scan(spark).count()
    assert remaining == 1
    assert t.count() == 1


def test_streaming_earliest_replays_remote_tier(spark, catalog, tmp_path):
    from fluss_spark.streaming.reader import read_stream

    t = _mk_log(catalog, "tiered_stream")
    for i in range(4):
        t.append(spark.createDataFrame([(i, "x")], "a int, b string"), ordering=["a"])
    tier_log(t, local_segments=1)
    # file-source streaming over a tiered table requires the explicit
    # frozen-tiers promise (moving watched files breaks file-source
    # semantics); without it read_stream must refuse
    with pytest.raises(ValueError, match="tiered"):
        read_stream(t, spark)
    out = (
        read_stream(t, spark, static_tiers=True)
        .writeStream.format("memory")
        .queryName("tiered_stream_q")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    out.awaitTermination(120)
    got = sorted(r["a"] for r in spark.sql("SELECT a FROM tiered_stream_q").collect())
    assert got == [0, 1, 2, 3]


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
)
def test_stream_dedupe_matches_batch_exact(spark, catalog, tmp_path, sf):
    """Streaming first-occurrence dedup over a document log == batch
    exact-dedup canonical set (fingerprint-keyed). Uses the native file
    stream + dropDuplicates state; availableNow drains the full log.
    Runs at sf0.01 AND sf0.1 (the bench scale — same equality the
    sessionize stream proves at sf0.1 in test_streaming)."""
    from fluss_spark.registry import load, load_all_queries
    from fluss_spark.streaming.reader import read_stream
    from fluss_spark.streaming.stateful import dedupe_stream
    from fluss_spark.table import create_table
    from fluss_spark.types import Field, TableSchema

    load_all_queries()
    docs = load(spark, sf, "documents").select("doc_id", "text")
    t = create_table(
        catalog, "db", "doc_log",
        TableSchema(fields=[Field("doc_id", "BIGINT"), Field("text", "STRING")], num_buckets=2),
    )
    t.append(docs, ordering=["doc_id"])

    fp = F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ").cast("binary"))
    sdf = read_stream(t, spark).withColumn("fingerprint", fp)
    out = (
        dedupe_stream(sdf, ["fingerprint"])
        .select("doc_id", "fingerprint")
        .writeStream.format("memory")
        .queryName("dedupe_stream_q")
        .option("checkpointLocation", str(tmp_path / "ckpt_dd"))
        .trigger(availableNow=True)
        .start()
    )
    out.awaitTermination(180)
    got = spark.sql("SELECT fingerprint, count(*) AS n FROM dedupe_stream_q GROUP BY 1").collect()
    # one survivor per distinct fingerprint, matching the batch dedup
    assert all(r["n"] == 1 for r in got)
    batch_fps = docs.select(fp.alias("fingerprint")).distinct().count()
    assert len(got) == batch_fps


def test_scan_prefers_local_on_crashed_tier_move(spark, catalog):
    """A crashed cross-device tier_log can leave a commit in BOTH tiers
    (remote copy landed, local delete didn't). Scans must not
    double-count: local stays authoritative until it is gone, and the
    next tier_log heals the orphan."""
    import shutil

    t = _mk_log(catalog, "crash_tier")
    for i in range(3):
        t.append(spark.createDataFrame([(i, "x")], "a int, b string"), ordering=["a"])
    # simulate the crash window: commit 1 copied to remote, local intact
    src = os.path.join(t.log.log_dir, "__commit=1")
    os.makedirs(t.log.remote_dir, exist_ok=True)
    shutil.copytree(src, os.path.join(t.log.remote_dir, "__commit=1"))
    assert t.scan(spark).count() == 3  # not 4
    assert sorted(r["a"] for r in t.scan(spark).collect()) == [0, 1, 2]
    # the retry heals: the orphan remote copy is replaced by the move
    moved = tier_log(t, local_segments=1)
    assert moved == 2
    assert t.scan(spark).count() == 3


def test_offset_reader_is_tier_transparent(spark, catalog, tmp_path):
    """The offset-based LogStreamReader is the supported streaming path
    for tiered tables (what read_stream's refusal points to): offsets
    are preserved by tier_log, so mid-stream tiering causes neither
    duplicates nor gaps — each poll delivers exactly the new offsets."""
    from fluss_spark.streaming.reader import LogStreamReader

    t = _mk_log(catalog, "tier_offset_stream")
    for i in range(4):
        t.append(spark.createDataFrame([(i, "x")], "a int, b string"), ordering=["a"])
    reader = LogStreamReader(t, spark, checkpoint_dir=str(tmp_path / "ck"), startup_mode="earliest")
    seen: list[int] = []
    reader.process_available(lambda df, bid: seen.extend(r["a"] for r in df.collect()))
    assert sorted(seen) == [0, 1, 2, 3]
    # tier sealed commits mid-stream, then append more
    assert tier_log(t, local_segments=1) == 3
    t.append(spark.createDataFrame([(9, "y")], "a int, b string"), ordering=["a"])
    new: list[int] = []
    reader.process_available(lambda df, bid: new.extend(r["a"] for r in df.collect()))
    assert new == [9]  # no re-delivery of tiered history, no gaps
    # a RESTARTED reader from the checkpoint also resumes cleanly
    r2 = LogStreamReader(t, spark, checkpoint_dir=str(tmp_path / "ck"), startup_mode="earliest")
    again: list[int] = []
    r2.process_available(lambda df, bid: again.extend(r["a"] for r in df.collect()))
    assert again == []
