"""bench.py emit(): the one-line JSON the driver records.

The headline must never be 0.0 when any config measured (VERDICT r4:
a budget-cut run that had four measured configs still printed value
0.0 because the primary config was the one cut off)."""

import importlib.util
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench_mod():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("bench", mod)
    spec.loader.exec_module(mod)
    return mod


def _emit_dict(bench_mod, results, capsys):
    bench_mod.emit(results)
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, "emit must print exactly one JSON line"
    return json.loads(out[0])


def test_emit_primary(bench_mod, capsys):
    r = {"1080p_main": {"e2e_fps": 7.0, "vs_baseline": 0.73,
                        "device_fps": 21.6, "baseline_fps": 9.5}}
    j = _emit_dict(bench_mod, r, capsys)
    assert j["metric"] == "e2e_fps_1080p"
    assert j["value"] == 7.0 and j["vs_baseline"] == 0.73
    assert j["configs"] == r


def test_emit_falls_back_when_primary_cut(bench_mod, capsys):
    r = {"bqmall_480p": {"e2e_fps": 20.0, "vs_baseline": 0.2},
         "rext_444": {"e2e_fps": 19.0, "vs_baseline": 0.24},
         "1080p_main": {"parse_fps": 10.0, "skipped": "device budget"}}
    j = _emit_dict(bench_mod, r, capsys)
    assert j["value"] == 19.0, "heaviest measured config wins"
    assert j["metric"] == "e2e_fps_rext"
    assert j["vs_baseline"] == 0.24


def test_emit_nothing_measured(bench_mod, capsys):
    j = _emit_dict(bench_mod, {"_note": "killed by signal 15"}, capsys)
    assert j["value"] == 0.0 and j["vs_baseline"] is None


def test_committed_bench_streams_resolve(bench_mod):
    """Every bench config's stream + oracle baseline ship in git, so a
    cold driver workspace never regenerates (the r4 bench killer)."""
    for name, cfg in bench_mod.CONFIGS.items():
        spath = bench_mod.stream_path(name, cfg)
        assert os.path.exists(spath), f"stream for {name} not committed"
        assert os.path.exists(spath + ".baseline.json"), \
            f"baseline for {name} not committed"
