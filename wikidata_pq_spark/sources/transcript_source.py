"""Custom Python DataSource: distributed synthetic-transcript generation.

``datagen.gen_transcripts`` runs on the driver -- fine for tests, a
bottleneck for a 100 TB-scale corpus. This Spark 4 Python DataSource
(`pyspark.sql.datasource`) generates the corpus ON THE EXECUTORS, one
deterministic slice per input partition (seed = base_seed + slice), so
corpus size scales with the cluster instead of driver memory -- the
same skip-nothing determinism discipline as the reference's demo
generator (reference: testing_area/demo_dataset.py:55-69 fixed seed +
chunked files), re-expressed as a source connector.

Usage::

    from wikidata_pq_spark.sources.transcript_source import register
    register(spark)
    df = (spark.read.format("synthetic_transcripts")
          .option("n_convs", 100000).option("mean_turns", 40)
          .option("n_entities", 2000).option("n_partitions", 64)
          .load())

Rows are yielded as Arrow RecordBatches (vectorized handoff, no
per-row Python in the exchange).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


class _Slice(InputPartition):
    def __init__(self, idx: int, n_convs: int, mean_turns: int,
                 n_entities: int, seed: int):
        self.idx = idx
        self.n_convs = n_convs
        self.mean_turns = mean_turns
        self.n_entities = n_entities
        self.seed = seed


class TranscriptReader(DataSourceReader):
    def __init__(self, options):
        self.n_convs = int(options.get("n_convs", 1000))
        self.mean_turns = int(options.get("mean_turns", 10))
        self.n_entities = int(options.get("n_entities", 500))
        self.seed = int(options.get("seed", 42))
        self.n_partitions = int(options.get("n_partitions", 8))

    def partitions(self):
        per = (self.n_convs + self.n_partitions - 1) // self.n_partitions
        out = []
        done = 0
        for i in range(self.n_partitions):
            k = min(per, self.n_convs - done)
            if k <= 0:
                break
            out.append(_Slice(i, k, self.mean_turns, self.n_entities, self.seed))
            done += k
        return out

    def read(self, part: _Slice):
        # executor-side: deterministic per-slice corpus; conv ids are
        # prefixed with the slice index so slices never collide (the
        # same uniqueness scheme bench_scaling's chunked generator uses)
        import pyarrow as pa

        from .. import datagen

        pdf = datagen.gen_transcripts(
            n_convs=part.n_convs,
            mean_turns=part.mean_turns,
            n_entities=part.n_entities,
            seed=part.seed + part.idx,
        )
        pdf["conv_id"] = f"s{part.idx}_" + pdf["conv_id"]
        # timestamps as microsecond Arrow (Spark's native unit)
        tbl = pa.Table.from_pandas(pdf, preserve_index=False)
        ts_idx = tbl.schema.get_field_index("ts")
        tbl = tbl.set_column(
            ts_idx, "ts", tbl.column("ts").cast(pa.timestamp("us"))
        )
        yield from tbl.to_batches(max_chunksize=65536)


class TranscriptDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_transcripts"

    def schema(self) -> str:
        return TRANSCRIPT_DDL

    def reader(self, schema) -> TranscriptReader:
        return TranscriptReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(TranscriptDataSource)
