"""Settings-layer tests: defaults, YAML/programmatic override, and an
end-to-end knob turn where BOTH the Spark plan and the DuckDB oracle are
rebuilt from the overridden settings and still agree."""

from __future__ import annotations

import duckdb
import pytest

from pipeline_mf_etl_spark.config import Settings, load_settings, override
from tests.conftest import SF_ORACLE, canonical_rows

SF_SMALL = "/root/testdata/sf0.001"


def test_defaults_match_reference_semantics():
    s = Settings()
    assert s.realism.price_floor == 5.0
    assert s.sensitivity.hold_bars == (3, 5, 8)
    assert s.backtest.round_trip_cost == pytest.approx(2e-3)
    assert s.bootstrap.cap == 50_000


def test_repo_yaml_restates_defaults():
    """configs/settings.yaml must not silently change behavior — it
    documents the defaults, so loading it equals the default tree."""
    assert load_settings() == Settings()


def test_yaml_override(tmp_path):
    f = tmp_path / "s.yaml"
    f.write_text("realism:\n  price_floor: 2.0\nsensitivity:\n  hold_bars: [2, 4]\n")
    s = load_settings(f)
    assert s.realism.price_floor == 2.0
    assert s.sensitivity.hold_bars == (2, 4)
    # untouched sections keep defaults
    assert s.calibration == Settings().calibration


def test_override_rejects_unknown_keys():
    with pytest.raises(KeyError):
        override(Settings(), realism={"not_a_knob": 1})
    with pytest.raises(KeyError):
        override(Settings(), not_a_section={"x": 1})


def test_override_rejects_non_mapping_section(tmp_path):
    """A scalar/list section must fail with the section NAMED, not an
    opaque AttributeError from vals.items()."""
    with pytest.raises(ValueError, match="indicators"):
        override(Settings(), indicators=10)
    f = tmp_path / "s.yaml"
    f.write_text("indicators: 10\n")
    with pytest.raises(ValueError, match="indicators"):
        load_settings(f)


def test_yaml_null_and_empty_sections(tmp_path):
    """An explicit `section:` null is a placeholder (ignored); an empty
    mapping is a no-op override — neither may crash or drift defaults."""
    f = tmp_path / "s.yaml"
    f.write_text("realism:\nbootstrap: {}\n")
    assert load_settings(f) == Settings()


@pytest.mark.parametrize(
    "knobs",
    [
        {"realism": {"price_floor": 2.0, "warmup_bars": 10}},
        {"calibration": {"price_floors": [2.0, 20.0], "dollar_vol_floors": [750.0]}},
        # integer knobs, as natural YAML would produce them — the frame
        # builder must coerce, not crash on the double schema
        {"calibration": {"price_floors": [1, 5], "dollar_vol_floors": [500]}},
    ],
)
def test_knob_override_end_to_end(spark, knobs):
    """Turning a knob must flow into BOTH the Spark frame and the oracle
    SQL, and the two must still hash-agree — the settings layer cannot
    desynchronize the parity contract."""
    from pipeline_mf_etl_spark.queries.backtest import (
        b4_frame,
        b4_oracle,
        b14_frame,
        b14_oracle,
    )

    s = override(Settings(), **knobs)
    if "realism" in knobs:
        frame, sql = b4_frame(spark, SF_SMALL, s), b4_oracle(s)
        # the knob actually changed the answer vs defaults
        default = b4_frame(spark, SF_SMALL, Settings())
        assert (
            frame.filter("exec_eligible").count()
            != default.filter("exec_eligible").count()
        )
    else:
        frame, sql = b14_frame(spark, SF_SMALL, s), b14_oracle(s)
        assert frame.count() == 2  # 2×1 grid

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_SMALL}/events.parquet')"
    )
    cur = con.execute(sql)
    duck_cols = [d[0] for d in cur.description]
    duck_rows = cur.fetchall()
    spark_rows = [tuple(r) for r in frame.collect()]
    assert sorted(frame.columns) == sorted(duck_cols)
    assert canonical_rows(spark_rows, frame.columns) == canonical_rows(
        duck_rows, duck_cols
    )


def test_show_config_cli_round_trips(capsys):
    """`show-config` prints the effective settings as JSON (reference
    cli.py:254-266 show-config)."""
    import json

    from pipeline_mf_etl_spark.__main__ import main

    assert main(["show-config"]) == 0
    payload = json.loads(capsys.readouterr().out)
    assert payload["backtest"]["hold_bars"] == 5
    assert "realism" in payload


def test_graph_and_streaming_settings_sections():
    """graph.reliable_checkpoints and streaming.lsh_max_bucket are
    config-driven (cluster deployments flip them in settings.yaml, no
    code edits): defaults are the local[32] fast path, overrides flow
    through the standard section mechanism, and the YAML loader accepts
    them like every other section."""
    from pipeline_mf_etl_spark.config import Settings, load_settings, override

    s = load_settings()
    assert s.graph.reliable_checkpoints is False
    assert s.streaming.lsh_max_bucket == 64

    o = override(
        Settings(),
        graph={"reliable_checkpoints": True},
        streaming={"lsh_max_bucket": None},
    )
    assert o.graph.reliable_checkpoints is True
    assert o.streaming.lsh_max_bucket is None


def test_graph_reliable_setting_reaches_loop_checkpoint(spark, tmp_path, monkeypatch):
    """The reliable=True path the config selects must actually produce a
    fault-tolerant checkpoint (files under the checkpoint dir), and the
    capped/uncapped admission paths must stay consistent with their
    settings defaults."""
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    from pipeline_mf_etl_spark.operators.graph import loop_checkpoint

    df = spark.range(10)
    out = loop_checkpoint(df, reliable=True)
    assert out.count() == 10
    ckpt_files = list((tmp_path / "ckpt").rglob("*"))
    assert ckpt_files, "reliable checkpoint wrote nothing durable"
