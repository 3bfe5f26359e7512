"""Sinks: parquet (native), text (native), TFRecord (pure-Python writer),
partitioned and bucketed table writers.

Bucketing is the 100 TB co-location primitive: two tables bucketed (and
sorted) on the same join key with the same bucket count join with NO
exchange and NO sort — the scan partitioning already satisfies the join's
distribution requirement (asserted by tests/test_plans.py). Partitioned
writes give partition pruning on read for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet — reads with an equality/IN filter
    on the partition columns prune directories before any IO."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def compact(
    spark,
    path: str,
    target_file_bytes: int = 512 * 1024 * 1024,
    out_path: str | None = None,
) -> int:
    """Rewrite a parquet dataset into ~target-sized files and return the
    new file count. Small-file proliferation is the classic failure mode
    of incremental pipelines at scale (every micro-batch/increment leaves
    a shard; a 100 TB table with 10⁷ tiny files is unreadable): compaction
    sizes output files from the dataset's actual bytes, never a fixed
    partition count. Writes to `out_path` (default: alongside as
    `<path>__compacted`) — the caller swaps directories; an in-place
    rewrite that fails mid-way would destroy data."""
    import math

    from py4j.java_gateway import java_import

    jvm = spark.sparkContext._jvm
    java_import(jvm, "org.apache.hadoop.fs.Path")
    hadoop_path = jvm.Path(path)
    fs = hadoop_path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    total = fs.getContentSummary(hadoop_path).getLength()
    n_files = max(1, math.ceil(total / target_file_bytes))
    out = out_path or f"{path.rstrip('/')}__compacted"
    df = spark.read.parquet(path)
    # coalesce, not repartition: no shuffle — each output task reads a
    # contiguous set of input files
    df.coalesce(n_files).write.mode("overwrite").parquet(out)
    return n_files


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-partition + sort by `cluster_cols` before writing: every
    output file holds a contiguous key range, so parquet row-group min/max
    statistics let filtered scans skip whole files (data skipping without
    a table format). The complement of `write_bucketed`: bucketing
    co-locates equal keys for joins; clustering orders keys for range
    predicates."""
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    num_buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (+ optionally sorted) parquet table, registered in the
    session catalog with an explicit external `path`. Joins/aggregations
    keyed on `bucket_cols` between tables with matching bucketing read
    co-located data: no exchange, and with `sort_cols` no sort either
    (sort-merge join directly on the scan)."""
    writer = df.write.mode(mode).format("parquet").option("path", path)
    writer = writer.bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def write_avro(
    df: DataFrame, path: str, codec: str = "deflate", overwrite: bool = True
) -> int:
    """Distributed Avro sink: one ``part-NNNNN.avro`` container file per
    partition, written executor-side through the pure-Python spec kernel
    (sinks/avro.py — no avro package). Streaming and memory-bounded:
    the header goes out on the first Arrow batch and every batch becomes
    one deflate block, so a partition of any size writes in O(batch)
    memory. Returns the total row count (the only thing collected).

    Encoders run row-at-a-time inside the partition writer — the same
    I/O-boundary tradeoff as the TFRecord sink (serialization IS the
    work here; there is no JVM avro writer to hand off to without the
    spark-avro package)."""
    import os
    import zlib

    import pandas as pd
    from pyspark import TaskContext

    from swivel_spark_prep_spark.sinks import avro as av

    if codec not in ("null", "deflate"):
        # must fail at write time — stamping an unimplemented codec name
        # into the container metadata would produce files every reader
        # (including sources.read_avro) rejects as corrupt
        raise ValueError(f"unsupported avro codec: {codec}")
    if overwrite:
        import shutil

        shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    schema = df.schema
    avsc = av.avro_schema_for(schema)
    ftypes = av.field_types_of(avsc)
    import json as _json

    meta_schema = _json.dumps(avsc).encode()

    type_names = [
        (f.dataType.typeName(), getattr(f.dataType, "elementType", None))
        for f in schema.fields
    ]

    def _conv(tn, v):
        if v is None or (isinstance(v, float) and v != v):
            return None
        if tn in ("long", "integer", "short", "byte"):
            return int(v)
        if tn in ("double", "float"):
            return float(v)
        if tn == "string":
            return str(v)
        if tn == "boolean":
            return bool(v)
        if tn == "binary":
            return bytes(v)
        if tn == "date":
            if v is pd.NaT:
                return None
            import datetime as _dt

            d = v.date() if isinstance(v, pd.Timestamp) else v
            return (d - _dt.date(1970, 1, 1)).days
        if tn in ("timestamp", "timestamp_ntz"):
            if v is pd.NaT:
                return None
            return int(pd.Timestamp(v).value // 1000)  # ns → µs
        if tn == "array":
            return None if v is None else list(v)
        raise ValueError(f"unsupported type {tn}")  # pragma: no cover

    def _write(batches):
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        fpath = os.path.join(path, f"part-{pid:05d}.avro")
        sync = os.urandom(16)
        n = 0
        f = None
        for pdf in batches:
            if f is None:
                f = open(fpath, "wb")
                f.write(av.MAGIC)
                f.write(av.zigzag_encode(2))
                for k, v in (
                    (b"avro.schema", meta_schema),
                    (b"avro.codec", codec.encode()),
                ):
                    f.write(av.zigzag_encode(len(k)))
                    f.write(k)
                    f.write(av.zigzag_encode(len(v)))
                    f.write(v)
                f.write(av.zigzag_encode(0))
                f.write(sync)
            recs = []
            cols = [pdf[c] for c in pdf.columns]
            for row in zip(*cols):
                vals = [
                    _conv(type_names[i][0], row[i]) for i in range(len(row))
                ]
                recs.append(av.encode_record(ftypes, vals))
            data = b"".join(recs)
            if codec == "deflate":
                co = zlib.compressobj(9, zlib.DEFLATED, -15)
                data = co.compress(data) + co.flush()
            f.write(av.zigzag_encode(len(recs)))
            f.write(av.zigzag_encode(len(data)))
            f.write(data)
            f.write(sync)
            n += len(recs)
        if f is not None:
            f.close()
        yield pd.DataFrame({"n": [n]})

    import pyspark.sql.functions as _F

    summary = df.mapInPandas(_write, "n long").agg(_F.sum("n")).collect()
    return int(summary[0][0] or 0)


def write_warc(
    df: DataFrame,
    path: str,
    payload_col: str = "text",
    id_col: str = "doc_id",
    meta_cols: list[str] | None = None,
    warc_type: str = "resource",
    date: str = "2024-01-01T00:00:00Z",
    codec: str = "gzip",
    overwrite: bool = True,
) -> int:
    """Distributed WARC sink (ISO 28500): one ``part-NNNNN.warc[.gz]``
    per partition, records encoded executor-side by the pure-Python
    kernel (sinks/warc.py). ``codec='gzip'`` writes record-at-time gzip
    members — the Common Crawl layout that keeps .warc.gz splittable by
    member boundary. Record ids derive from ``id_col``
    (``<urn:doc:ID>``) and ``date`` is a fixed caller-supplied stamp,
    so output bytes are deterministic for a deterministic frame.
    ``meta_cols`` become ``X-Meta-<col>`` headers (stringified).
    Returns the total record count (the only thing collected)."""
    import os

    import pandas as pd
    from pyspark import TaskContext

    from swivel_spark_prep_spark.sinks import warc as wk

    if codec not in ("none", "gzip"):
        raise ValueError(f"unsupported warc codec: {codec}")
    if overwrite:
        import shutil

        shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    metas = meta_cols or []
    ext = "warc.gz" if codec == "gzip" else "warc"

    def _write(batches):
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        fpath = os.path.join(path, f"part-{pid:05d}.{ext}")
        n = 0
        f = None
        for pdf in batches:
            if f is None:
                f = open(fpath, "wb")
            for row in zip(
                pdf[id_col], pdf[payload_col], *[pdf[m] for m in metas]
            ):
                payload = row[1]
                payload = (
                    payload.encode("utf-8")
                    if isinstance(payload, str)
                    else bytes(payload)
                )
                rec = wk.encode_record(
                    warc_type,
                    f"<urn:doc:{row[0]}>",
                    date,
                    payload,
                    [(f"X-Meta-{m}", str(v)) for m, v in zip(metas, row[2:])],
                )
                f.write(wk.gzip_member(rec) if codec == "gzip" else rec)
                n += 1
        if f is not None:
            f.close()
        yield pd.DataFrame({"n": [n]})

    import pyspark.sql.functions as _F

    summary = df.mapInPandas(_write, "n long").agg(_F.sum("n")).collect()
    return int(summary[0][0] or 0)


def write_arrow_ipc(df: DataFrame, path: str, overwrite: bool = True) -> int:
    """Distributed Arrow IPC (Feather v2) sink: one ``part-NNNNN.arrow``
    file per partition, written executor-side with pyarrow's file
    writer — the zero-copy interchange format for handing partitions to
    ML tooling (training loaders, DuckDB, polars all read it natively).
    Each Arrow batch becomes one record batch in the file, so a
    partition of any size streams in O(batch) memory. Returns the total
    row count (the only thing collected)."""
    import os

    import pandas as pd
    import pyarrow as pa
    from pyspark import TaskContext

    if overwrite:
        import shutil

        shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    # Arrow schema from the SPARK schema — inferring from an empty
    # pandas frame types every object column as null
    _pa = {
        "long": pa.int64(), "integer": pa.int32(), "short": pa.int16(),
        "byte": pa.int8(), "double": pa.float64(), "float": pa.float32(),
        "string": pa.string(), "boolean": pa.bool_(), "binary": pa.binary(),
        "date": pa.date32(), "timestamp": pa.timestamp("us"),
        "timestamp_ntz": pa.timestamp("us"),
    }
    fields = []
    for f in df.schema.fields:
        tn = f.dataType.typeName()
        if tn == "array":
            et = f.dataType.elementType.typeName()
            if et not in _pa:
                raise ValueError(f"unsupported arrow array element: {et}")
            fields.append(pa.field(f.name, pa.list_(_pa[et])))
        elif tn in _pa:
            fields.append(pa.field(f.name, _pa[tn]))
        else:
            raise ValueError(f"unsupported arrow sink type: {tn}")
    schema_ser = pa.schema(fields).serialize().to_pybytes()

    def _write(batches):
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        fpath = os.path.join(path, f"part-{pid:05d}.arrow")
        schema = pa.ipc.read_schema(pa.BufferReader(schema_ser))
        n = 0
        writer = None
        for pdf in batches:
            if writer is None:
                writer = pa.ipc.new_file(fpath, schema)
            writer.write_batch(
                pa.RecordBatch.from_pandas(
                    pdf, schema=schema, preserve_index=False
                )
            )
            n += len(pdf)
        if writer is not None:
            writer.close()
        yield pd.DataFrame({"n": [n]})

    import pyspark.sql.functions as _F

    summary = df.mapInPandas(_write, "n long").agg(_F.sum("n")).collect()
    return int(summary[0][0] or 0)


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    """XML sink via Spark 4's built-in XML data source — one file per
    partition, streamed row-at-a-time on executors (no driver
    materialization). XML is an interchange/legacy-feed format: prefer
    parquet for anything the engine re-reads."""
    (
        df.write.mode(mode)
        .format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .save(path)
    )
