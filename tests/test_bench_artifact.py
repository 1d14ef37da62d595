"""BENCH_LOCAL.json artifact: full per-query record with
delta-vs-previous, keyed by scale factor (round-3 verdict ask #2 —
the driver's 2000-char stdout tail keeps only ~60 of 131 per-query
timings, so the committed artifact is the only complete
round-over-round record)."""

from __future__ import annotations

import json

from bench import _write_local_artifact


def test_artifact_first_run_and_delta(tmp_path):
    path = str(tmp_path / "BENCH_LOCAL.json")
    _write_local_artifact(0.1, {"q1": 1.0, "q2": 2.0}, {}, 3.0, 0, path=path)
    doc = json.loads(open(path).read())
    rec = doc["sf0.1"]
    assert rec["queries"] == {"q1": 1.0, "q2": 2.0}
    assert rec["value"] == 3.0
    assert "prev" not in rec

    # second run at the same sf: deltas vs previous, prev retained
    _write_local_artifact(0.1, {"q1": 2.0, "q3": 5.0}, {}, 7.0, 1, path=path)
    rec = json.loads(open(path).read())["sf0.1"]
    assert rec["prev"]["queries"] == {"q1": 1.0, "q2": 2.0}
    assert rec["delta_ratio"] == {"q1": 2.0}  # q3 is new, q2 gone


def test_artifact_sf_keys_do_not_clobber(tmp_path):
    path = str(tmp_path / "BENCH_LOCAL.json")
    _write_local_artifact(0.1, {"q1": 1.0}, {}, 1.0, 0, path=path)
    _write_local_artifact(0.01, {"q1": 0.5}, {"error:qx": "boom"}, 0.5, 0, path=path)
    doc = json.loads(open(path).read())
    assert set(doc) == {"sf0.1", "sf0.01"}
    assert doc["sf0.1"]["queries"] == {"q1": 1.0}
    assert doc["sf0.01"]["errors"] == {"error:qx": "boom"}
    # a cross-sf run never produces deltas against the other sf
    assert "prev" not in doc["sf0.01"]


def test_round_artifact_stamps_closing_round_when_ledger_matches_window(tmp_path):
    """Verdict r11 ask #6: the closing bench runs right after the
    driver writes CORRECTNESS_rN at the same HEAD, so the round
    artifact must stamp rN (not rN+1) exactly when the newest
    ledger's checked-key set equals the CURRENT driver window; a
    mid-round bench (ledger still holds the PREVIOUS window) keeps
    stamping the next counter."""
    import os

    from trafik_etl_modular_spark.registry import DRIVER_WINDOW

    path = str(tmp_path / "BENCH_LOCAL.json")
    # closing-bench case: ledger keys == current window -> stamp r05
    with open(tmp_path / "CORRECTNESS_r05.json", "w") as f:
        json.dump({n: {"hash_match": True} for n in DRIVER_WINDOW}, f)
    _write_local_artifact(0.1, {"q1": 1.0}, {}, 1.0, 0, path=path)
    assert os.path.exists(tmp_path / "BENCH_FULL_r05.json")
    assert not os.path.exists(tmp_path / "BENCH_FULL_r06.json")

    # mid-round case: ledger describes a DIFFERENT window -> r07
    with open(tmp_path / "CORRECTNESS_r06.json", "w") as f:
        json.dump({"some_old_query": {"hash_match": True}}, f)
    _write_local_artifact(0.1, {"q1": 1.0}, {}, 1.0, 0, path=path)
    assert os.path.exists(tmp_path / "BENCH_FULL_r07.json")


def test_artifact_cpu_keyed_records_do_not_clobber(tmp_path):
    """VERDICT r12 item 8: the driver benches the same sf at 32 and 8
    cores back-to-back; the 8-core run used to overwrite the 32-core
    per-query map.  With `cpus` passed, records key as sf*/c* and
    coexist; the first keyed run still reads a legacy sf* record as
    its prev baseline."""
    path = str(tmp_path / "BENCH_LOCAL.json")
    # legacy record (old key format), then a keyed 32-core run
    _write_local_artifact(0.1, {"q1": 1.0}, {}, 1.0, 0, path=path)
    _write_local_artifact(0.1, {"q1": 2.0}, {}, 2.0, 0, path=path, cpus="32")
    doc = json.loads(open(path).read())
    assert set(doc) == {"sf0.1", "sf0.1/c32"}
    # legacy record served as the prev baseline for the first keyed run
    assert doc["sf0.1/c32"]["prev"]["queries"] == {"q1": 1.0}
    assert doc["sf0.1/c32"]["delta_ratio"] == {"q1": 2.0}

    # an 8-core run neither clobbers nor compares against the 32-core map
    _write_local_artifact(0.1, {"q1": 4.0}, {}, 4.0, 0, path=path, cpus="8")
    doc = json.loads(open(path).read())
    assert doc["sf0.1/c32"]["queries"] == {"q1": 2.0}
    assert doc["sf0.1/c8"]["queries"] == {"q1": 4.0}
    # its prev fell back to the legacy record, not the c32 one
    assert doc["sf0.1/c8"]["prev"]["queries"] == {"q1": 1.0}

    # second keyed run compares against its own cpu cohort
    _write_local_artifact(0.1, {"q1": 3.0}, {}, 3.0, 0, path=path, cpus="32")
    doc = json.loads(open(path).read())
    assert doc["sf0.1/c32"]["prev"]["queries"] == {"q1": 2.0}
    assert doc["sf0.1/c32"]["delta_ratio"] == {"q1": 1.5}
