"""YAML config loading (config.yml: rpc endpoints + DB creds) and its CLI
resolution order."""

from __future__ import annotations

import pytest

from apollo_spark.config import AppConfig, ConfigError, DbSettings, find_config, load_config

EXAMPLE = """
rpc:
  ethereum: https://eth.example.com/rpc
  arbitrum: https://arb1.example.com/rpc
  optimism: wss://ws.optimism.example.com

postgres:
  host: 172.17.0.2
  user: chainreader
  password: secret
  name: postgres
"""


def test_load_example_shape(tmp_path):
    p = tmp_path / "config.yml"
    p.write_text(EXAMPLE)
    cfg = load_config(p)
    # http vs ws transports split by scheme (apollo mixes them in one map)
    assert cfg.rpc == {
        "ethereum": "https://eth.example.com/rpc",
        "arbitrum": "https://arb1.example.com/rpc",
    }
    assert cfg.ws == {"optimism": "wss://ws.optimism.example.com"}
    assert cfg.ws_endpoint("optimism").startswith("wss://")
    with pytest.raises(ConfigError, match="ethereum"):
        cfg.ws_endpoint("ethereum")
    url, props = cfg.resolve_jdbc()
    assert url == "jdbc:postgresql://172.17.0.2:5432/postgres"
    assert props["user"] == "chainreader" and props["driver"] == "org.postgresql.Driver"


def test_jdbc_escape_hatch(tmp_path):
    p = tmp_path / "config.yml"
    p.write_text(
        """
jdbc:
  url: jdbc:derby:/tmp/mydb;create=true
  properties:
    driver: org.apache.derby.jdbc.EmbeddedDriver
"""
    )
    url, props = load_config(p).resolve_jdbc()
    assert url.startswith("jdbc:derby:") and props["driver"].endswith("EmbeddedDriver")


def test_no_db_block_resolves_none(tmp_path):
    p = tmp_path / "config.yml"
    p.write_text("rpc:\n  ethereum: http://x\n")
    assert load_config(p).resolve_jdbc() is None


def test_bad_yaml_is_loud(tmp_path):
    p = tmp_path / "config.yml"
    p.write_text("rpc: [unclosed")
    with pytest.raises(ConfigError, match="invalid YAML"):
        load_config(p)
    with pytest.raises(ConfigError, match="not found"):
        load_config(tmp_path / "missing.yml")
    p2 = tmp_path / "list.yml"
    p2.write_text("- a\n- b\n")
    with pytest.raises(ConfigError, match="mapping"):
        load_config(p2)


def test_find_config_resolution_order(tmp_path, monkeypatch):
    confdir = tmp_path / "conf"
    confdir.mkdir()
    (confdir / "config.yml").write_text("rpc:\n  ethereum: http://from-confdir\n")
    explicit = tmp_path / "explicit.yml"
    explicit.write_text("rpc:\n  ethereum: http://from-explicit\n")
    userdir = tmp_path / "xdg" / "apollo_spark"
    userdir.mkdir(parents=True)
    (userdir / "config.yml").write_text("rpc:\n  ethereum: http://from-user\n")
    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path / "xdg"))

    assert find_config(confdir, explicit).rpc["ethereum"] == "http://from-explicit"
    assert find_config(confdir).rpc["ethereum"] == "http://from-confdir"
    assert find_config(None).rpc["ethereum"] == "http://from-user"
    assert find_config(tmp_path / "nowhere") .rpc["ethereum"] == "http://from-user"
    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path / "empty-xdg"))
    assert find_config(tmp_path / "nowhere") is None
    # explicit path that doesn't exist: loud, not silently ignored
    with pytest.raises(ConfigError):
        find_config(confdir, tmp_path / "gone.yml")


def test_db_settings_defaults():
    db = DbSettings(host="h", user="u", password="p", name="n")
    assert db.jdbc_url() == "jdbc:postgresql://h:5432/n"
    assert AppConfig(db=db).resolve_jdbc()[0].endswith("/n")
