"""Source registry — the Spark analog of the reference's 10 connectors.

The reference's connectors (dbqt/connections.py:152-698) build SQL text
and mail it to an external engine. Here a "database" is whatever Spark
can read: every connection type resolves to ``spark.read`` with the right
format/options, and all downstream operators receive plain DataFrames —
computation happens in Spark, distributed, instead of in the remote
engine.

| reference type | Spark mapping |
|---|---|
| parquet / duckdb-file | directory of ``*.parquet`` (one table per file) or a single file |
| csv | directory of ``*.csv``, header + schema inference (S1) |
| json / orc | directory of ``*.json`` (JSON Lines) / ``*.orc`` — Spark-native readers the reference lacks |
| s3parquet | ``s3a://bucket/key`` through Hadoop S3A — no manual download (S3) |
| mysql/postgresql/sqlserver/oracle/snowflake | ``spark.read.format("jdbc")`` with the dialect's URL; Spark pushes filters and (where enabled) aggregates down (S4) |
| athena | read the underlying S3 data directly, or JDBC (S5) |
| jdbc (generic) | verbatim ``url`` + ``driver`` from the config — any engine with a JDBC jar; live-tested against embedded Derby |
| warc | web-crawl archives (ISO 28500): one "table" per ``*.warc[.gz]`` file, parsed by the pure-stdlib streaming reader in ``sources/warc.py`` — a source the reference lacks entirely |
| cdx | web-archive CDX(J) indexes: one "table" per ``*.cdx[j][.gz]`` file, parsed distributed via ``sources/cdx.parse_cdxj`` |

JDBC/S3 paths require the corresponding driver jars/filesystem on the
cluster; in this container they raise a clear error when exercised, and
everything else works on local files.
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame, SparkSession

logger = logging.getLogger(__name__)

_JDBC_URLS = {
    "mysql": "jdbc:mysql://{host}:{port}/{database}",
    "postgresql": "jdbc:postgresql://{host}:{port}/{database}",
    "sqlserver": "jdbc:sqlserver://{host}:{port};databaseName={database}",
    "oracle": "jdbc:oracle:thin:@{host}:{port}/{database}",
    "snowflake": "jdbc:snowflake://{account}.snowflakecomputing.com/",
    # Athena speaks JDBC too (Simba driver); direct-S3 is the preferred
    # path when the table location is known (see Database.load)
    "athena": "jdbc:awsathena://athena.{region}.amazonaws.com:443",
    # generic escape hatch: `url` is taken verbatim from the config, for
    # any engine with a JDBC driver on the classpath (also what the live
    # end-to-end test drives against embedded Derby — the one dialect
    # whose driver ships inside Spark itself)
    "jdbc": "{url}",
}

_DEFAULT_PORTS = {
    "mysql": 3306,
    "postgresql": 5432,
    "sqlserver": 1433,
    "oracle": 1521,
}


class Database:
    """A connection-config-driven table namespace backed by spark.read."""

    def __init__(self, spark: SparkSession, connection: dict):
        self.spark = spark
        self.connection = connection or {}
        self.kind = (self.connection.get("type") or "parquet").lower()

    # -- file-backed kinds ---------------------------------------------------

    def _root(self) -> str:
        return (
            self.connection.get("path")
            or self.connection.get("database")
            or "."
        )

    def _ext(self) -> str:
        return {"csv": ".csv", "json": ".json", "orc": ".orc"}.get(
            self.kind, ".parquet"
        )

    def list_tables(self) -> list[str]:
        """S8: table discovery."""
        if self.kind in ("warc", "cdx"):
            root = self._root()
            if "://" in root:
                # load() supports remote roots via a glob, but
                # enumerating them needs a Hadoop FS listing we
                # deliberately don't take on — fail with the remedy
                # instead of os.listdir's FileNotFoundError (r13 ADVICE)
                raise ValueError(
                    f"table discovery is unsupported for remote "
                    f"{self.kind} roots ({root}); load tables by name "
                    "instead"
                )
            sfx = (
                (".warc", ".warc.gz", ".arc.gz")
                if self.kind == "warc"
                else (".cdx", ".cdxj", ".cdx.gz", ".cdxj.gz")
            )
            if os.path.isfile(root):
                return [self._warc_stem(os.path.basename(root))]
            # same suffix set load()/_list_warc_files accept; set():
            # sibling flavors of one index (idx.cdx + idx.cdxj) are
            # ONE table, not two
            return sorted(
                {
                    self._warc_stem(f)
                    for f in os.listdir(root)
                    if f.endswith(sfx)
                }
            )
        if self.kind in ("parquet", "csv", "duckdb", "json", "orc"):
            root = self._root()
            if os.path.isfile(root):
                return [os.path.splitext(os.path.basename(root))[0]]
            ext = self._ext()
            return sorted(
                f[: -len(ext)] for f in os.listdir(root) if f.endswith(ext)
            )
        if self.kind in _JDBC_URLS:
            default_schema = "public" if self.kind != "athena" else (
                self.connection.get("database", "default")
            )
            q = (
                "SELECT table_name FROM information_schema.tables "
                "WHERE table_schema = '{schema}'"
            ).format(schema=self.connection.get("schema", default_schema))
            return [r[0] for r in self._jdbc_query(q).collect()]
        raise ValueError(f"unsupported connection type: {self.kind}")

    def load(self, table: str) -> DataFrame:
        """Load one table as a DataFrame (lazy)."""
        if self.kind in ("parquet", "duckdb", "s3parquet"):
            path = self._table_path(table, ".parquet")
            # reuse the nanos-timestamp-safe loader for local paths
            if not path.startswith("s3"):
                from ..catalog import load_table

                return load_table(
                    self.spark, os.path.dirname(path),
                    os.path.splitext(os.path.basename(path))[0],
                )
            # an S3 prefix reads all objects under it — this subsumes the
            # reference's prefix auto-select (connections.py:343-376,
            # "one object under the prefix -> use that file") and
            # generalizes it to the multi-file layout Spark prefers
            return self.spark.read.parquet(path)
        if self.kind == "athena":
            # Athena tables ARE files in S3: when the config carries the
            # table location root, read it directly (scales: Spark scans
            # S3 in parallel, no Athena query quota / result staging).
            # Otherwise fall back to the Athena JDBC driver.
            if self.connection.get("s3_location"):
                return self.spark.read.parquet(self._athena_table_path(table))
            return self._jdbc_table(table)
        if self.kind == "csv":
            return (
                self.spark.read.option("header", True)
                .option("inferSchema", True)
                .csv(self._table_path(table, ".csv"))
            )
        if self.kind == "json":
            # JSON Lines; Spark infers the schema with a sampling pass.
            return self.spark.read.json(self._table_path(table, ".json"))
        if self.kind == "orc":
            return self.spark.read.orc(self._table_path(table, ".orc"))
        if self.kind == "warc":
            from .warc import read_warc

            root = self._root()
            if "://" in root:
                # remote root (s3a://, hdfs://): glob through the
                # binaryFile arm — Hadoop resolves the pattern, no
                # driver-side listing
                # Hadoop brace alternation covers the same suffix
                # family local discovery accepts (.warc[.gz], .arc.gz)
                path = (
                    f"{root.rstrip('/')}/{table}"
                    ".{warc,warc.gz,arc.gz}"
                )
            elif os.path.isfile(root):
                path = root
            else:
                candidates = [
                    os.path.join(root, table + sfx)
                    for sfx in (".warc", ".warc.gz", ".arc.gz")
                ]
                path = next(
                    (p for p in candidates if os.path.exists(p)), None
                )
                if path is None:
                    # fail on the DRIVER with the table named — the
                    # executor-side open() error loses the table->file
                    # mapping
                    raise FileNotFoundError(
                        f"no {table}.warc[.gz]/.arc.gz under {root}"
                    )
            # connection-level knobs: record_types (default: responses
            # only — the rows a curation pipeline wants), via (stream /
            # binary / auto, see read_warc)
            types = self.connection.get("record_types", ("response",))
            return read_warc(
                self.spark,
                path,
                record_types=tuple(types) if types is not None else None,
                via=self.connection.get("via", "auto"),
            )
        if self.kind == "cdx":
            # CDXJ archive-index files as typed capture tables: Spark's
            # text source handles .gz transparently and splits plain
            # files by line — the index parses fully distributed
            from .cdx import parse_cdxj

            root = self._root()
            if "://" in root:
                path = f"{root.rstrip('/')}/{table}.cdx*"
            elif os.path.isfile(root):
                path = root
            else:
                candidates = [
                    os.path.join(root, table + sfx)
                    for sfx in (".cdx", ".cdxj", ".cdx.gz", ".cdxj.gz")
                ]
                path = next(
                    (p for p in candidates if os.path.exists(p)), None
                )
                if path is None:
                    raise FileNotFoundError(
                        f"no {table}.cdx[j][.gz] under {root}"
                    )
            return parse_cdxj(self.spark.read.text(path), "value")
        if self.kind in _JDBC_URLS:
            return self._jdbc_table(table)
        raise ValueError(f"unsupported connection type: {self.kind}")

    @staticmethod
    def _warc_stem(fname: str) -> str:
        for suffix in (
            ".warc.gz", ".warc", ".arc.gz",
            ".cdxj.gz", ".cdxj", ".cdx.gz", ".cdx",
        ):
            if fname.endswith(suffix):
                return fname[: -len(suffix)]
        return os.path.splitext(fname)[0]

    def _athena_table_path(self, table: str) -> str:
        """<s3_location>/<table>/ through Hadoop's s3a connector (the s3://
        scheme Athena configs carry has no Hadoop filesystem)."""
        loc = self.connection["s3_location"].rstrip("/")
        if loc.startswith("s3://"):
            loc = "s3a://" + loc[len("s3://"):]
        return f"{loc}/{table}/"

    def _table_path(self, table: str, ext: str) -> str:
        root = self._root()
        if self.kind == "s3parquet":
            bucket = self.connection.get("bucket")
            key = self.connection.get("key", table)
            return f"s3a://{bucket}/{key}"
        if os.path.isfile(root):
            return root
        named = os.path.join(root, f"{table}{ext}")
        if not os.path.exists(named) and os.path.isdir(root):
            # reference's prefix auto-select (connections.py:343-376):
            # pointing at a location with exactly ONE data file means that
            # file, whatever it is named
            only = [f for f in os.listdir(root) if f.endswith(ext)]
            if len(only) == 1:
                return os.path.join(root, only[0])
        return named

    # -- JDBC ---------------------------------------------------------------

    def _jdbc_options(self) -> dict:
        c = self.connection
        url = _JDBC_URLS[self.kind].format(
            host=c.get("host", "localhost"),
            port=c.get("port", _DEFAULT_PORTS.get(self.kind, 0)),
            database=c.get("database", ""),
            account=c.get("account", ""),
            region=c.get("aws_region", "us-east-1"),
            url=c.get("url", ""),
        )
        opts = {"url": url}
        if self.kind == "athena":
            # reference config surface (connections.py:608-698): workgroup
            # default "primary", catalog "AwsDataCatalog", optional
            # database; staging dir is where Athena writes result sets
            opts["driver"] = "com.simba.athena.jdbc.Driver"
            opts["Workgroup"] = str(c.get("workgroup", "primary"))
            opts["Catalog"] = str(c.get("catalog", "AwsDataCatalog"))
            if c.get("s3_staging_dir"):
                opts["S3OutputLocation"] = str(c["s3_staging_dir"])
            if c.get("database"):
                opts["Schema"] = str(c["database"])
        for k in ("user", "password", "driver"):
            if c.get(k):
                opts[k] = str(c[k])
        # Parallel reads: without a partition column a JDBC scan is ONE
        # task pulling the whole table through one connection — the
        # single biggest JDBC scale lever. Config carries an integral
        # column + bounds; Spark then issues numPartitions range queries
        # concurrently. fetch_size tunes rows-per-round-trip.
        if c.get("partition_column"):
            opts["partitionColumn"] = str(c["partition_column"])
            opts["numPartitions"] = str(c.get("num_partitions", 8))
            if c.get("lower_bound") is not None:
                opts["lowerBound"] = str(c["lower_bound"])
            if c.get("upper_bound") is not None:
                opts["upperBound"] = str(c["upper_bound"])
        if c.get("fetch_size"):
            opts["fetchsize"] = str(c["fetch_size"])
        return opts

    def _jdbc_table(self, table: str) -> DataFrame:
        reader = self.spark.read.format("jdbc")
        for k, v in self._jdbc_options().items():
            reader = reader.option(k, v)
        return reader.option("dbtable", table).load()

    def _jdbc_query(self, query: str) -> DataFrame:
        reader = self.spark.read.format("jdbc")
        for k, v in self._jdbc_options().items():
            reader = reader.option(k, v)
        return reader.option("query", query).load()


def connect(spark: SparkSession, connection: dict) -> Database:
    return Database(spark, connection)
