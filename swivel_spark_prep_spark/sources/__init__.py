"""Sources: corpus text, JSONL, CSV, and the fixture parquet catalog.

The reference consumes a line-oriented text corpus (one document/sentence
per line, whitespace tokens — SURVEY.md §1.1 D1). ``read_corpus_text``
reproduces that contract on Spark's distributed text reader; the other
readers round out the engine's ingestion surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swivel_spark_prep_spark.catalog import load_all, load_table, register_views  # noqa: F401
from swivel_spark_prep_spark.session import configure_runtime


def read_corpus_text(spark: SparkSession, path: str) -> DataFrame:
    """Line-oriented corpus → (doc_id, text). doc_id is unique but not
    dense (monotonically_increasing_id) — swivel semantics only need
    line-locality, never global line numbers, so no zipWithIndex pass is
    spent on it."""
    configure_runtime(spark)
    return (
        spark.read.text(path)
        .select(
            F.monotonically_increasing_id().alias("doc_id"),
            F.col("value").alias("text"),
        )
        .filter(F.length("text") > 0)
    )


def read_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    configure_runtime(spark)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_csv(
    spark: SparkSession, path: str, schema=None, header: bool = True
) -> DataFrame:
    configure_runtime(spark)
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same columnar/vectorized/pushdown properties as parquet
    (Spark's native OrcFileFormat); schema always comes from the files."""
    configure_runtime(spark)
    return spark.read.orc(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    configure_runtime(spark)
    return spark.read.parquet(path)


def read_tfrecord_records(spark: SparkSession, path: str) -> DataFrame:
    """Distributed TFRecord source: (file, record_idx, payload) — one row
    per framed record, both CRCs verified executor-side.

    Built on Spark's binaryFile source (one task per file; TFRecord shard
    files are bounded by the writer's shard size, so a whole file per
    task is the right granularity) + a mapInPandas framing parser
    (sinks.tfrecord.parse_tfrecord_stream). Pair with
    sinks.tfrecord.decode_example to get feature dicts back — the exact
    inverse of the shard writer, round-trip-tested.
    """
    from collections.abc import Iterator

    import pandas as pd

    from swivel_spark_prep_spark.sinks.tfrecord import parse_tfrecord_stream

    configure_runtime(spark)
    bf = spark.read.format("binaryFile").load(path).select("path", "content")

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for idx, payload in enumerate(
                    parse_tfrecord_stream(bytes(content))
                ):
                    rows.append((fpath, idx, payload))
            yield pd.DataFrame(
                rows, columns=["file", "record_idx", "payload"]
            )

    return bf.mapInPandas(
        _parse, schema="file string, record_idx long, payload binary"
    )


def read_avro(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """Distributed Avro source — the exact inverse of
    ``sinks.write_avro``: binaryFile (one task per container file) +
    executor-side spec-kernel parse (sinks/avro.py) with per-block sync
    verification; logical types (date, timestamp-micros) come back as
    real date/timestamp columns.

    ``schema`` (Spark DDL) skips the driver-side peek; without it the
    lexicographically-first part file's header is read locally to learn
    the schema (a driver-mounted path, same contract as the CLI inputs —
    pass ``schema`` for object-store paths). Either way every file's
    embedded schema is validated executor-side against the expected
    Avro schema (derived from the DDL when one is passed), so a
    mixed-schema or mis-declared directory fails loudly instead of
    misdecoding columns by position."""
    import glob as _glob
    import json as _json
    from collections.abc import Iterator

    import pandas as pd

    from swivel_spark_prep_spark.sinks import avro as av

    configure_runtime(spark)
    from pyspark.sql.types import StructType

    if schema is None:
        parts = sorted(_glob.glob(f"{path}/part-*.avro")) or sorted(
            _glob.glob(path)
        )
        if not parts:
            raise FileNotFoundError(f"no avro files under {path}")
        with open(parts[0], "rb") as fh:
            head = fh.read(1 << 20)
        avsc_ref = av.read_container_header(head)
        schema = av.spark_schema_for(avsc_ref)
    else:
        # derive the expected Avro schema from the declared DDL — the
        # validation must run in BOTH modes, or a mis-declared schema
        # would silently map decoded values to columns by position
        avsc_ref = av.avro_schema_for(StructType.fromDDL(schema))
    expected = _json.dumps(avsc_ref, sort_keys=True)

    ddl_schema = StructType.fromDDL(schema)
    tns = [
        (f.name, f.dataType.typeName()) for f in ddl_schema.fields
    ]

    bf = spark.read.format("binaryFile").load(path).select("content")

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import datetime as _dt

        for pdf in batches:
            for content in pdf["content"]:
                avsc, rows = av.read_container(bytes(content))
                if _json.dumps(avsc, sort_keys=True) != expected:
                    raise ValueError(
                        "avro file schema differs from expected schema"
                    )
                cols = {}
                for i, (name, tn) in enumerate(tns):
                    vals = [r[i] for r in rows]
                    if tn in ("timestamp", "timestamp_ntz"):
                        cols[name] = pd.to_datetime(
                            pd.Series(vals, dtype="object"), unit="us"
                        )
                    elif tn == "date":
                        cols[name] = pd.Series(
                            [
                                None
                                if v is None
                                else _dt.date(1970, 1, 1)
                                + _dt.timedelta(days=v)
                                for v in vals
                            ],
                            dtype="object",
                        )
                    else:
                        cols[name] = pd.Series(vals, dtype="object")
                yield pd.DataFrame(cols, columns=[n for n, _ in tns])

    return bf.mapInPandas(_parse, ddl_schema)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC source — the exact inverse of
    ``sinks.write_warc`` and a reader for any spec-shaped .warc /
    record-gzipped .warc.gz (the Common Crawl layout): binaryFile (one
    task per container) + executor-side kernel parse (sinks/warc.py).
    Returns (record_id, warc_type, date, headers map, payload binary);
    payload decode is the caller's business — HTML/text extraction
    composes downstream."""
    from collections.abc import Iterator

    import pandas as pd

    from swivel_spark_prep_spark.sinks import warc as wk

    configure_runtime(spark)
    bf = spark.read.format("binaryFile").load(path).select("content")

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                recs = wk.parse_warc_bytes(bytes(content))
                yield pd.DataFrame(
                    {
                        "record_id": [r["record_id"] for r in recs],
                        "warc_type": [r["warc_type"] for r in recs],
                        "date": [r["date"] for r in recs],
                        "headers": [r["headers"] for r in recs],
                        "payload": [r["payload"] for r in recs],
                    }
                )

    return bf.mapInPandas(
        _parse,
        "record_id string, warc_type string, date string, "
        "headers map<string,string>, payload binary",
    )


def read_parquet_with_provenance(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read that carries row-level file provenance: every row
    gains ``_file_path`` (the hidden ``_metadata.file_path`` struct
    field, resolved scan-side by Spark — zero extra I/O, works under
    partition pruning and predicate pushdown). The lineage primitive
    for audits ("which input file produced this bad row") and
    selective reprocessing."""
    configure_runtime(spark)
    return spark.read.parquet(path).withColumn(
        "_file_path", F.col("_metadata.file_path")
    )


def read_arrow_ipc(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Distributed Arrow IPC (Feather v2) source — the inverse of
    ``sinks.write_arrow_ipc``: binaryFile (one task per .arrow file) +
    pyarrow file reader per container. ``schema`` is the Spark DDL the
    frames decode to (Arrow files carry their own schema; the DDL makes
    the Spark-side contract explicit and mismatches fail loudly)."""
    from collections.abc import Iterator

    import pandas as pd

    configure_runtime(spark)
    bf = spark.read.format("binaryFile").load(path).select("content")

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow as pa

        for pdf in batches:
            for content in pdf["content"]:
                reader = pa.ipc.open_file(pa.BufferReader(bytes(content)))
                # per-record-batch iteration — read_all() would hold the
                # raw bytes, the Arrow table, AND the pandas frame at
                # once; the sink wrote one batch per Arrow batch exactly
                # so the read side can stay O(batch) too
                for i in range(reader.num_record_batches):
                    yield reader.get_batch(i).to_pandas()

    return bf.mapInPandas(_parse, schema)


def read_xml(
    spark: SparkSession, path: str, row_tag: str = "row", schema=None
) -> DataFrame:
    """XML source via Spark 4's built-in XML data source (the upstreamed
    spark-xml): splittable element-level parse on executors. Pass an
    explicit ``schema`` in production paths — inference scans twice and
    types drift with the data."""
    configure_runtime(spark)
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def read_npy(spark: SparkSession, path: str, id_from: str = "offset") -> DataFrame:
    """Distributed reader for ``.npy`` matrix dumps — the de-facto
    interchange format for embedding arrays coming OUT of a training
    job (np.save per shard). Files are listed and shipped whole via
    the binaryFile source (one executor task per file — .npy has no
    internal split points, the standard whole-file-format trade, same
    as the WARC/Arrow readers here); each 2-D float array explodes to
    one row per vector: (file, row_idx, embedding array<double>,
    vec_id). ``vec_id`` is globally unique and REPRODUCIBLE: with
    ``id_from='offset'`` it is row_idx offset by the cumulative row
    counts of lexically-preceding files (two passes: a header-only
    count pass over file prefixes — bytes are not re-read, the
    binaryFile relation is reused — then the decode pass), so the same
    directory always yields the same ids regardless of partitioning.
    1-D files are treated as a single vector. Decode is numpy over the
    Arrow batch (np.load on a BytesIO), never row-at-a-time Python.
    """
    import io

    import numpy as np  # noqa: F401 (executor-side import below)

    files = spark.read.format("binaryFile").option(
        "pathGlobFilter", "*.npy"
    ).load(path)

    def _counts(batches):
        import io as _io

        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                arr = _np.load(_io.BytesIO(r["content"]), allow_pickle=False)
                n = 1 if arr.ndim == 1 else int(arr.shape[0])
                rows.append((r["path"], n))
            if rows:
                yield _pd.DataFrame(rows, columns=["path", "n"])

    counts = sorted(
        (r["path"], r["n"])
        for r in files.select("path", "content")
        .mapInPandas(_counts, "path string, n long")
        .collect()
    )  # bounded: one (path, count) pair per FILE — control-plane
    offsets = {}
    acc = 0
    for p, n in counts:
        offsets[p] = acc
        acc += n
    bc = spark.sparkContext.broadcast(offsets)

    def _decode(batches):
        import io as _io

        import numpy as _np
        import pandas as _pd

        offs = bc.value
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                arr = _np.load(_io.BytesIO(r["content"]), allow_pickle=False)
                if arr.ndim == 1:
                    arr = arr[None, :]
                base = offs[r["path"]]
                for i in range(arr.shape[0]):
                    out.append(
                        (
                            r["path"],
                            i,
                            base + i,
                            [float(x) for x in arr[i]],
                        )
                    )
            if out:
                yield _pd.DataFrame(
                    out, columns=["file", "row_idx", "vec_id", "embedding"]
                )

    return files.select("path", "content").mapInPandas(
        _decode,
        "file string, row_idx long, vec_id long, embedding array<double>",
    )


def write_npy(df: DataFrame, vec_col: str, out_dir: str) -> int:
    """Write an embedding column as one ``.npy`` shard per partition —
    the inverse interchange direction (hand vectors TO a numpy-reading
    trainer). Each executor task dumps its partition's vectors with
    np.save into ``out_dir/part-<pid>.npy`` (local/shared filesystem;
    for object stores route through a mounted path or the Hadoop-FS
    adapter pattern of versioned.py). Returns the number of shards
    written. Empty partitions write nothing.
    """
    import os

    os.makedirs(out_dir, exist_ok=True)

    def _dump(batches):
        import os as _os

        import numpy as _np
        import pandas as _pd
        from pyspark import TaskContext

        rows = []
        for pdf in batches:
            if len(pdf):
                rows.append(_np.array(pdf[vec_col].tolist(), dtype=_np.float64))
        if rows:
            pid = TaskContext.get().partitionId()
            _np.save(
                _os.path.join(out_dir, f"part-{pid:05d}.npy"),
                _np.vstack(rows),
            )
            yield _pd.DataFrame({"n": [sum(len(r) for r in rows)]})

    written = df.select(F.col(vec_col).alias(vec_col)).mapInPandas(
        _dump, "n long"
    ).count()
    return int(written)
