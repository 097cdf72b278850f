"""CLI (V3/V4) and serving-core (V1/V2) parity tests.

FastAPI/Redis aren't in this container, so the framework-free
``Service`` core is tested directly (the FastAPI wrapper is a thin
import-gated shim) and the Redis sink exercises its JSON fallback.
"""

from __future__ import annotations

import json
import math
import os

import pytest

from big_data_lab_three_spark.flows import preprocess_flows, split_data
from big_data_lab_three_spark.catalog import Catalog


@pytest.fixture(scope="module")
def flow_csv(tmp_path_factory):
    """Synthetic CICIDS-style CSV: leading-space headers, BENIGN/attack
    labels, ±inf rates (FIXTURES.md §1)."""
    p = tmp_path_factory.mktemp("flows") / "flows.csv"
    rows = [
        "Flow ID, Source IP, Label, Source Port,Flow Bytes/s, Flow Duration",
        "f1,10.0.0.1,BENIGN,80,125.5,10",
        "f2,10.0.0.2,DoS Hulk,443,inf,20",
        "f3,10.0.0.3,BENIGN,80,-inf,30",
        "f4,10.0.0.4,PortScan,22,88.1,40",
    ]
    p.write_text("\n".join(rows))
    return str(p)


def test_preprocess_flows_semantics(spark, flow_csv):
    from big_data_lab_three_spark.sources import read_csv

    out = preprocess_flows(read_csv(spark, flow_csv))
    rows = {r["Source Port"]: r.asDict() for r in out.collect()}
    # identity cols dropped, names stripped
    assert "Flow ID" not in out.columns and "Label" not in out.columns
    assert "Source Port" in out.columns  # leading space stripped
    # label binarized: BENIGN→1 else 0
    assert rows[80]["State"] == 1 and rows[443]["State"] == 0
    # ±inf → NULL
    assert rows[443]["Flow Bytes/s"] is None
    assert all(
        v is None or not math.isinf(v)
        for r in rows.values()
        for v in r.values()
        if isinstance(v, float)
    )


def test_split_data_writes_catalog(spark, flow_csv, tmp_path):
    cfg = str(tmp_path / "config.ini")
    cat = Catalog(cfg)
    cat.set_section("DATA", {"train_file": flow_csv, "test_file": flow_csv})
    ok = split_data(spark, cat, out_dir=str(tmp_path / "data"))
    assert ok
    cat2 = Catalog(cfg)
    assert cat2.get("PREPROCESSED_DATA", "train_x") is not None
    assert os.path.isdir(cat2.get("PREPROCESSED_DATA", "train_x"))


def test_cli_train_and_predict(tmp_path, monkeypatch, capsys):
    from big_data_lab_three_spark import cli

    monkeypatch.chdir(tmp_path)
    rc = cli.main(
        ["--config", str(tmp_path / "c.ini"), "train", "-m", "D_TREE",
         "--params", '{"max_depth": 3}', "--no-save"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"model_trained": True, "model_type": "d_tree"}

    rc = cli.main(
        ["--config", str(tmp_path / "c.ini"), "predict", "-m", "GNB",
         "-t", "smoke"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["model"] == "gnb" and 0.0 <= out["test_score"] <= 1.0


def test_service_train_predict_upload(tmp_path, monkeypatch):
    from big_data_lab_three_spark.serve.app import Service

    monkeypatch.chdir(tmp_path)
    svc = Service()
    result = svc.train("d_tree", save_model=False, predict_flag=True)
    assert result["model_trained"] and not result["model_saved"]
    assert 0.0 <= result["test_score"] <= 1.0

    with pytest.raises(ValueError):
        svc.train("not_a_model")

    smoke = svc.predict("smoke", "d_tree")
    assert smoke["from_cache"] is False  # no redis in container

    csv_bytes = (
        "l_quantity,l_extendedprice,l_discount,l_tax,extra_col\n"
        "10,1000.5,0.05,0.02,ignored\n"
        "40,99999.0,0.09,0.01,ignored\n"
    ).encode()
    up = svc.predict("upload", "d_tree", file_contents=csv_bytes)
    assert up["n_rows"] == 2
    assert all(p in (0, 1) for p in up["predictions"])

    with pytest.raises(ValueError):
        svc.predict("upload", "d_tree", file_contents=None)


def _write_fixture(path, rows=8):
    """A func-mode fixture in the reference shape (FIXTURES.md §2):
    lineitem-feature X records (one with a missing key, one with +inf)
    positionally aligned with y State records."""
    xs, ys = [], []
    for i in range(rows):
        x = {
            "l_quantity": float(5 + i * 7),
            "l_extendedprice": 1000.0 + 11000.0 * i,
            "l_discount": 0.01 * (i % 10),
            "l_tax": 0.02,
        }
        if i == 1:
            del x["l_tax"]  # missing key → NULL fill via conform
        if i == 2:
            x["l_discount"] = float("inf")  # ±inf → NULL (P4)
        xs.append(x)
        ys.append({"State": i % 2})
    with open(path, "w") as f:
        json.dump({"X": xs, "y": ys}, f)


def test_predict_func_mode_writes_experiment_records(
    spark, tmp_path, monkeypatch, capsys
):
    """V3 func + S9 (reference src/predict.py:127-169): fixture replay
    through json-normalize → conform → score, one experiment dir per
    fixture with exp_config.yaml + log copy + model copy."""
    import yaml

    from big_data_lab_three_spark import cli

    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("ARTIFACT_DIR", str(tmp_path / "experiments"))
    monkeypatch.setenv("LOG_FILE", str(tmp_path / "logfile.log"))
    fx = tmp_path / "unit_tests"
    fx.mkdir()
    _write_fixture(fx / "test_a.json")
    _write_fixture(fx / "test_b.json", rows=5)

    rc = cli.main(
        ["--config", str(tmp_path / "c.ini"), "predict", "-m", "D_TREE",
         "-t", "func", "--fixtures-dir", str(fx)]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mode"] == "func"
    assert sorted(out["fixture_scores"]) == ["test_a.json", "test_b.json"]
    assert all(0.0 <= s <= 1.0 for s in out["fixture_scores"].values())
    assert len(out["experiment_dirs"]) == 2

    for exp_dir, fixture in zip(
        sorted(out["experiment_dirs"]), ["test_a.json", "test_b.json"]
    ):
        assert os.path.basename(exp_dir).startswith("exp_test_a") or \
            os.path.basename(exp_dir).startswith("exp_test_b")
        with open(os.path.join(exp_dir, "exp_config.yaml")) as f:
            rec = yaml.safe_load(f)
        # reference record keys (src/predict.py:147-154)
        assert rec["model"] == "d_tree" and rec["tests"] == "func"
        assert rec["X_test_path"] == rec["y_test_path"] == fixture
        assert 0.0 <= float(rec["score"]) <= 1.0
        assert isinstance(rec["model_params"], dict)
        # log + model artifact copies (src/predict.py:161-169)
        assert os.path.isfile(os.path.join(exp_dir, "exp_logfile.log"))
        assert os.path.isdir(os.path.join(exp_dir, "exp_d_tree.sparkml"))


def test_func_mode_missing_fixtures_dir_fails_cleanly(
    tmp_path, monkeypatch, capsys
):
    from big_data_lab_three_spark import cli

    monkeypatch.chdir(tmp_path)
    # absolute: the JVM resolves relative save paths against ITS startup
    # cwd, not the monkeypatched Python cwd
    monkeypatch.setenv("ARTIFACT_DIR", str(tmp_path / "experiments"))
    rc = cli.main(
        ["--config", str(tmp_path / "c.ini"), "predict", "-m", "GNB",
         "-t", "func", "--fixtures-dir", str(tmp_path / "nope")]
    )
    assert rc == 1
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "error" in out


def test_load_func_fixture_alignment_and_conform(spark, tmp_path):
    """Positional X[i]↔y[i] pairing survives the distributed explode;
    missing keys fill NULL; ±inf nullified (src/predict.py:134-138)."""
    from big_data_lab_three_spark.ml.experiment import load_func_fixture

    p = tmp_path / "fx.json"
    _write_fixture(p, rows=6)
    contract = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    df = load_func_fixture(spark, str(p), contract)
    rows = df.collect()
    assert [r["label"] for r in rows] == [float(i % 2) for i in range(6)]
    assert [r["l_quantity"] for r in rows] == [5.0 + 7 * i for i in range(6)]
    assert rows[1]["l_tax"] is None        # missing key → NULL
    assert rows[2]["l_discount"] is None   # +inf → NULL


def test_load_func_fixture_rejects_misaligned_and_empty(spark, tmp_path):
    """Positional pairing is the fixture contract: a length mismatch
    must fail loudly (never silently truncate), and an empty fixture
    must not surface as a NULL score downstream."""
    from big_data_lab_three_spark.ml.experiment import load_func_fixture

    contract = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    bad = tmp_path / "misaligned.json"
    with open(bad, "w") as f:
        json.dump(
            {"X": [{"l_quantity": 1.0}, {"l_quantity": 2.0}],
             "y": [{"State": 1}]},
            f,
        )
    with pytest.raises(ValueError, match="misaligned"):
        load_func_fixture(spark, str(bad), contract)

    empty = tmp_path / "empty.json"
    with open(empty, "w") as f:
        json.dump({"X": [], "y": []}, f)
    with pytest.raises(ValueError, match="empty"):
        load_func_fixture(spark, str(empty), contract)
