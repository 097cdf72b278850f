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
