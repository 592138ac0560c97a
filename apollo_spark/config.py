"""YAML config loading: per-chain RPC endpoints + database credentials.

Mirrors apollo's config surface (/root/reference/config.go:13-31,
config.example.yml:4-17): a ``rpc:`` map of chain -> endpoint URL and a
``postgres:`` credentials block. Differences, Spark-era by design:

* the DB block compiles to a JDBC URL + properties (Spark's writer), with
  ``jdbc_url`` available as an escape hatch for non-Postgres targets;
* ``ws:`` endpoints (for the realtime bridge daemon) are split out of
  ``rpc:`` automatically — apollo uses one URL per chain for both transports,
  we route http(s) to the batch client and ws(s) to the bridge.

Config resolution order (apollo's ConfigPath, config.go:33-40, adapted):
explicit path > <confdir>/config.yml > $XDG_CONFIG_HOME/apollo_spark/config.yml.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from pathlib import Path

import yaml


class ConfigError(Exception):
    pass


@dataclass
class DbSettings:
    """Postgres block (db.DbSettings, /root/reference/db/db.go:24-31)."""

    host: str = ""
    port: int = 5432
    user: str = ""
    password: str = ""
    name: str = ""

    def jdbc_url(self) -> str:
        return f"jdbc:postgresql://{self.host}:{self.port}/{self.name}"

    def jdbc_properties(self) -> dict[str, str]:
        return {"user": self.user, "password": self.password, "driver": "org.postgresql.Driver"}


@dataclass
class AppConfig:
    rpc: dict[str, str] = field(default_factory=dict)  # chain -> http(s) URL
    ws: dict[str, str] = field(default_factory=dict)  # chain -> ws(s) URL
    db: DbSettings | None = None
    jdbc_url: str | None = None  # overrides db.jdbc_url() when set
    jdbc_properties: dict[str, str] = field(default_factory=dict)

    def http_endpoints(self) -> dict[str, str]:
        return dict(self.rpc)

    def ws_endpoint(self, chain: str) -> str:
        if chain not in self.ws:
            raise ConfigError(f"no websocket endpoint for chain {chain!r} (realtime mode needs ws:// or wss://)")
        return self.ws[chain]

    def resolve_jdbc(self) -> tuple[str, dict[str, str]] | None:
        if self.jdbc_url:
            return self.jdbc_url, dict(self.jdbc_properties)
        if self.db and self.db.host:
            return self.db.jdbc_url(), self.db.jdbc_properties()
        return None


def default_config_path() -> Path:
    """$XDG_CONFIG_HOME/apollo_spark/config.yml (config.go:33-40's
    UserConfigDir semantics on linux)."""
    base = os.environ.get("XDG_CONFIG_HOME") or str(Path.home() / ".config")
    return Path(base) / "apollo_spark" / "config.yml"


def load_config(path: str | Path) -> AppConfig:
    path = Path(path)
    try:
        raw = yaml.safe_load(path.read_text()) or {}
    except FileNotFoundError:
        raise ConfigError(f"config file not found: {path}") from None
    except yaml.YAMLError as e:
        raise ConfigError(f"invalid YAML in {path}: {e}") from e
    if not isinstance(raw, dict):
        raise ConfigError(f"config root must be a mapping, got {type(raw).__name__}")

    rpc_block = raw.get("rpc") or {}
    if not isinstance(rpc_block, dict):
        raise ConfigError("'rpc' must be a map of chain -> endpoint URL")
    http: dict[str, str] = {}
    ws: dict[str, str] = {}
    for chain, url in rpc_block.items():
        u = str(url)
        # apollo mixes transports in one map (config.example.yml:4-11);
        # route by scheme so each consumer gets the transport it can use
        (ws if u.startswith(("ws://", "wss://")) else http)[str(chain)] = u
    for chain, url in (raw.get("ws") or {}).items():
        ws[str(chain)] = str(url)

    db = None
    pg = raw.get("postgres")
    if pg:
        if not isinstance(pg, dict):
            raise ConfigError("'postgres' must be a mapping")
        db = DbSettings(
            host=str(pg.get("host", "")),
            port=int(pg.get("port", 5432)),
            user=str(pg.get("user", "")),
            password=str(pg.get("password", "")),
            name=str(pg.get("name", "")),
        )

    jdbc = raw.get("jdbc") or {}
    return AppConfig(
        rpc=http,
        ws=ws,
        db=db,
        jdbc_url=str(jdbc["url"]) if isinstance(jdbc, dict) and jdbc.get("url") else None,
        jdbc_properties={str(k): str(v) for k, v in (jdbc.get("properties") or {}).items()}
        if isinstance(jdbc, dict)
        else {},
    )


def find_config(confdir: str | Path | None, explicit: str | Path | None = None) -> AppConfig | None:
    """Resolution order: explicit path (must exist) > <confdir>/config.yml >
    user default path. Returns None when nothing is found and nothing was
    explicitly requested."""
    if explicit:
        return load_config(explicit)
    for candidate in ([Path(confdir) / "config.yml"] if confdir else []) + [default_config_path()]:
        if candidate.exists():
            return load_config(candidate)
    return None
