"""CLI entry point: the Spark replacement for apollo's binary
(/root/reference/main.go:33-65, flags.go:8-50).

    python -m apollo_spark --confdir ./conf --csv --stdout
    python -m apollo_spark --confdir ./conf --realtime --db jdbc:...

Flags mirror the reference: --realtime, --stdout, --csv, --db, --rate-limit,
--log-level; plus Spark-era additions --data-dir (the landed-table catalog
root), --output-dir, --master. The schema is always <confdir>/schema.hcl
(dsl/schema.go:381-383).
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("apollo_spark", description=__doc__)
    p.add_argument("--confdir", required=True, help="directory with schema.hcl + ABI json files")
    p.add_argument("--data-dir", required=True, help="landed-table catalog root (parquet)")
    p.add_argument("-R", "--realtime", action="store_true", help="streaming mode (flags.go:10-14)")
    p.add_argument("--stdout", action="store_true", help="log rows to stdout (flags.go:24-29)")
    p.add_argument("--csv", action="store_true", help="write csv per query (flags.go:17-22)")
    p.add_argument("--json", action="store_true", help="write jsonl per query (ROADMAP.md:67-76, unshipped in apollo)")
    p.add_argument(
        "--tx-table",
        action="store_true",
        help="write a manifest-committed transactional parquet table per query "
        "(atomic snapshots, time travel, exactly-once streaming; table_format.py)",
    )
    p.add_argument("--db", default=None, help="JDBC URL for the db sink (overrides config.yml postgres block)")
    p.add_argument(
        "--config",
        default=None,
        help="config.yml path (default: <confdir>/config.yml, then "
        "$XDG_CONFIG_HOME/apollo_spark/config.yml) — per-chain RPC endpoints + DB creds",
    )
    p.add_argument("--output-dir", default="./output", help="csv/parquet sink root")
    p.add_argument("--rate-limit", type=float, default=100.0, help="RPC rps cap (flags.go:31-36)")
    p.add_argument(
        "--log-parts",
        type=int,
        default=50,
        help="initial range-split for live eth_getLogs fetches (flags.go:43-48; "
        "sources/rpc_logs.py bisects further on range-too-large)",
    )
    p.add_argument("--log-level", default="WARN")
    p.add_argument("--master", default=None, help="Spark master override")
    p.add_argument("--bridge-dir", default=None, help="realtime: WS->JSONL bridge directory")
    p.add_argument("--check", action="store_true", help="parse + validate + compile only; print output schemas, run nothing")
    p.add_argument("--explain", action="store_true", help="like --check, plus the optimized physical plan per query")
    return p


_INIT_CONFIG = """\
# apollo_spark config.yml — per-chain RPC endpoints + DB credentials.
# http(s) URLs serve the batch client; ws(s) URLs feed the realtime bridge.
rpc:
  ethereum: https://YOUR-ETH-RPC
  arbitrum: https://YOUR-ARBITRUM-RPC
  polygon: wss://YOUR-POLYGON-WS

# Postgres sink credentials (compiled to a JDBC URL); or set jdbc_url
# directly for any other SQL target.
postgres:
  host: 127.0.0.1
  port: 5432
  user: apollo
  password: apollo
  name: apollo
"""

_INIT_SCHEMA = """\
// apollo_spark starter schema — historical ERC20 transfers to stdout:
//   python -m apollo_spark --confdir <dir> --data-dir <lake> --stdout
query my_transfers {
  chain = "ethereum"

  contract "0x0000000000000000000000000000000000000000" {
    abi = "erc20.abi.json"

    event Transfer {
      outputs = ["from", "to", "value"]
    }
  }

  save {
    block  = blocknumber
    sender = from
    amount = parse_decimals(value, 18)
  }
}
"""


def run_init(confdir: str | None = None) -> int:
    """``init`` subcommand (main.go:43-51, Init at main.go:58-86): write the
    starter config.yml + schema.hcl. Target dir is --confdir when given,
    else the user config dir (apollo uses os.UserConfigDir)."""
    base = Path(confdir) if confdir else Path(
        os.environ.get("XDG_CONFIG_HOME", str(Path.home() / ".config"))
    ) / "apollo_spark"
    base.mkdir(parents=True, exist_ok=True)
    for fname, content in (("config.yml", _INIT_CONFIG), ("schema.hcl", _INIT_SCHEMA)):
        target = base / fname
        if target.exists():
            print(f"kept existing {target}")
            continue
        target.write_text(content)
        print(f"{fname.split('.')[0]} written {target}")
    return 0


def run_table(argv: list[str]) -> int:
    """``table`` subcommand: TxTable maintenance without writing a script —
    the OPTIMIZE/VACUUM/DESCRIBE HISTORY surface of lakehouse formats.

        python -m apollo_spark table history --path out/tables/q
        python -m apollo_spark table count   --path out/tables/q [--version N]
        python -m apollo_spark table compact --path out/tables/q --num-files 4 [--sort-by a,b]
        python -m apollo_spark table vacuum  --path out/tables/q --retain-last 3
    """
    tp = argparse.ArgumentParser("apollo_spark table")
    tp.add_argument("action", choices=["history", "count", "compact", "vacuum"])
    tp.add_argument("--path", required=True, help="TxTable root directory")
    tp.add_argument("--version", type=int, default=None, help="count: snapshot version (default current)")
    tp.add_argument("--num-files", type=int, default=1, help="compact: target file count")
    tp.add_argument("--sort-by", default=None, help="compact: comma-separated cluster columns")
    tp.add_argument("--retain-last", type=int, default=3, help="vacuum: manifests to retain")
    tp.add_argument("--master", default=None)
    a = tp.parse_args(argv)
    from apollo_spark.table_format import TxTable

    t = TxTable(a.path)
    if a.action == "history":
        for h in t.history():
            print(h)
        return 0
    if a.action == "count":
        n = t.row_count(a.version)
        print(n if n is not None else "unknown (pre-stats manifest)")
        return 0
    if a.action == "vacuum":
        deleted = t.vacuum(retain_last=a.retain_last)
        print(f"deleted {len(deleted)} files")
        return 0
    from apollo_spark.session import get_spark

    spark = get_spark("apollo_spark_table", master=a.master)
    sort_by = a.sort_by.split(",") if a.sort_by else None
    n = t.compact(spark, num_files=a.num_files, sort_by=sort_by)
    print(f"compacted to {n} files")
    return 0


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] == "init":
        ip = argparse.ArgumentParser("apollo_spark init")
        ip.add_argument("--confdir", default=None)
        return run_init(ip.parse_args(argv[1:]).confdir)
    if argv and argv[0] == "table":
        return run_table(argv[1:])
    args = build_parser().parse_args(argv)
    from apollo_spark.config import find_config
    from apollo_spark.dsl.schema import parse_schema_file
    from apollo_spark.pipeline import PipelineOptions, compile_schema
    from apollo_spark.session import get_spark
    from apollo_spark.sinks import SinkConfig, SinkWriter
    from apollo_spark.sources.tables import Catalog

    schema_path = Path(args.confdir) / "schema.hcl"
    if not schema_path.exists():
        print(f"schema not found: {schema_path}", file=sys.stderr)
        return 2
    schema = parse_schema_file(schema_path)
    schema.validate(realtime=args.realtime)

    # config.yml: per-chain RPC endpoints + DB creds (config.go:13-31)
    app_cfg = find_config(args.confdir, args.config)

    spark = get_spark("apollo_spark_cli", master=args.master)
    spark.sparkContext.setLogLevel(args.log_level)

    from apollo_spark.metrics import RunMetrics

    metrics = RunMetrics(spark)
    client_factory = None
    if app_cfg and app_cfg.rpc:
        from apollo_spark.sources.rpc_client import http_client_factory

        client_factory = http_client_factory(
            app_cfg.http_endpoints(), rate_limit=args.rate_limit, metrics=metrics
        )
    catalog = Catalog(spark, args.data_dir)
    options = PipelineOptions(
        realtime=args.realtime,
        rate_limit=args.rate_limit,
        client_factory=client_factory,
        log_parts=args.log_parts,
        # --check/--explain promise "compile only, run nothing": expect
        # validation is an eager action, so it must be skipped here (it would
        # otherwise fully execute every expect-gated query, including live
        # RPC method sources)
        validate_expect=not (args.check or args.explain),
    )

    jdbc_url, jdbc_props = args.db, {}
    if jdbc_url is None and app_cfg:
        resolved = app_cfg.resolve_jdbc()
        if resolved:
            jdbc_url, jdbc_props = resolved
    sink_cfg = SinkConfig(
        stdout=args.stdout,
        csv_dir=str(Path(args.output_dir)) if args.csv else None,
        json_dir=str(Path(args.output_dir)) if args.json else None,
        tx_table_dir=str(Path(args.output_dir) / "tables") if args.tx_table else None,
        jdbc_url=jdbc_url,
        jdbc_properties=jdbc_props,
        single_file=True,
    )
    writer = SinkWriter(sink_cfg)

    if not args.realtime:
        frames = compile_schema(spark, catalog, schema, options)
        if args.check or args.explain:
            # operability: validate/compile without executing. --check prints
            # each query's output schema; --explain its optimized physical
            # plan (the .explain("formatted") the plan audits assert on).
            for name, df in frames.items():
                print(f"query {name}: {df.schema.simpleString()}")
                if args.explain:
                    df.explain("formatted")
            return 0
        for name, df in frames.items():
            writer.write(df, name)
            df.unpersist()  # release the expect-validation cache (no-op otherwise)
        # exit-time metrics report (DumpMetrics, chainservice.go:293-307)
        metrics.dump()
        return 0

    # realtime: one stream per query's event source via the bridge directory.
    # With a ws endpoint in config.yml the bridge daemon is spawned in-process
    # (apollo's per-query eth_subscribe, events.go:221-320); an external
    # bridge writing --bridge-dir works too.
    bridge_dir = args.bridge_dir
    if not bridge_dir and app_cfg and app_cfg.ws:
        import threading

        from apollo_spark.config import ConfigError
        from apollo_spark.sources.ws_bridge import run_bridge

        bridge_dir = str(Path(args.output_dir) / "_bridge")
        # ONE subscription per distinct chain — per-query bridges would
        # subscribe to the same chain's full log feed N times and append
        # every log N times into the shared bridge directory
        chains = sorted({q.chain for q in schema.queries})
        try:
            endpoints = {c: app_cfg.ws_endpoint(c) for c in chains}
        except ConfigError as e:
            print(f"--realtime: {e}", file=sys.stderr)
            return 2
        for chain, ws_url in endpoints.items():
            threading.Thread(
                target=run_bridge,
                args=(ws_url, bridge_dir, chain),
                daemon=True,
            ).start()
    if not bridge_dir:
        print(
            "--realtime requires --bridge-dir (external WS->JSONL bridge) "
            "or a ws:// endpoint in config.yml",
            file=sys.stderr,
        )
        return 2
    args.bridge_dir = bridge_dir
    from apollo_spark.pipeline import compile_streaming_query

    # ONE stream per query: all of a query's event sources union into a
    # single plan with the same transform/filter/save tail as batch
    # (main.go:173-193's shared EvalSave loop), so each query has exactly
    # one sink writer and one checkpoint — no per-stream checkpoint
    # collisions, no concurrent writers appending to one table.
    queries = []
    for q in schema.queries:
        sdf = compile_streaming_query(spark, catalog, q, schema, args.bridge_dir, options)
        queries.append(
            sdf.writeStream.foreachBatch(writer.foreach_batch(q.name))
            .option("checkpointLocation", str(Path(args.output_dir) / "_ckpt" / q.name))
            .start()
        )
    for q_ in queries:
        q_.awaitTermination()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
