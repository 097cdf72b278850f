"""CLI entry points — V3/V4 parity (SURVEY.md §2.11).

Reference commands:
- ``python src/preprocess.py``                → ``cli.py preprocess``
- ``python src/train.py``                     → ``cli.py train [-m MODEL]``
- ``python src/predict.py -m M -t T``         → ``cli.py predict -m M -t T``

Model names accept the reference's uppercase spellings
(``RAND_FOREST``/``GNB``/``LOG_REG``/``D_TREE``,
``src/predict.py:52-58``) as well as the lowercase API names.
"""

from __future__ import annotations

import argparse
import json
import sys

from big_data_lab_three_spark.catalog import Catalog
from big_data_lab_three_spark.logger import get_logger
from big_data_lab_three_spark.session import get_spark

log = get_logger("cli")

MODEL_ALIASES = {
    "RAND_FOREST": "rand_forest", "GNB": "gnb",
    "LOG_REG": "log_reg", "D_TREE": "d_tree",
}


def _canon_model(name: str) -> str:
    return MODEL_ALIASES.get(name, name)


def _labeled_testdata(spark, sf_dir: str):
    """Demo training frame from the driver's lineitem table (the flow
    CSVs aren't shipped; any CSV configured in [DATA] takes precedence
    via ``preprocess``)."""
    from pyspark.sql import functions as F

    from big_data_lab_three_spark.sources import table

    feats = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    df = table(spark, sf_dir, "lineitem").select(
        *feats, (F.col("l_returnflag") == "R").cast("int").alias("label")
    )
    return df, feats


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="big_data_lab_three_spark")
    p.add_argument("--config", default="config.ini")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("preprocess", help="V4: split_data from [DATA] config")

    tr = sub.add_parser("train", help="V4/V1: train a model")
    tr.add_argument("-m", "--model", default="log_reg")
    tr.add_argument("--params", default="{}", help="JSON hyperparams")
    tr.add_argument("--no-save", action="store_true")

    pr = sub.add_parser("predict", help="V3: self-test modes")
    pr.add_argument("-m", "--model", default="D_TREE")
    pr.add_argument(
        "-t", "--test-mode", default="smoke", choices=["smoke", "func", "db"]
    )
    pr.add_argument(
        "--fixtures-dir",
        default=None,
        help="func-mode JSON fixture dir (default: [DATA] unit_tests_dir "
        "from config, else ./unit_tests — reference src/predict.py:128)",
    )

    args = p.parse_args(argv)
    catalog = Catalog(args.config)
    spark = get_spark("cli")

    if args.cmd == "preprocess":
        from big_data_lab_three_spark.flows import split_data

        ok = split_data(spark, catalog)
        print(json.dumps({"preprocessed": ok}))
        return 0 if ok else 1

    df, feats = _labeled_testdata(spark, args.sf_dir)
    train, test = df.randomSplit([0.7, 0.3], seed=42)

    from big_data_lab_three_spark.ml import MultiModel

    mm = MultiModel(spark, train, test, feats, catalog=catalog)

    if args.cmd == "train":
        model = _canon_model(args.model)
        try:
            ok = mm.train(model, json.loads(args.params), save=not args.no_save)
        except ValueError as e:
            print(json.dumps({"error": str(e)}))
            return 2
        print(json.dumps({"model_trained": ok, "model_type": model}))
        return 0 if ok else 1

    if args.cmd == "predict":
        model = _canon_model(args.model)
        mode = args.test_mode
        if not mm.train(model, save=(mode != "smoke")):
            return 1
        fixtures = args.fixtures_dir or catalog.get(
            "DATA", "unit_tests_dir", fallback="unit_tests"
        )
        try:
            result = mm.predict(model, mode, fixtures_dir=fixtures)
        except Exception as e:  # noqa: BLE001 — reference parity: the
            # func branch catches ALL exceptions and exits 1
            # (src/predict.py), so fixture-shape failures the upfront
            # validation can't foresee still honor {"error": ...}/rc-1
            log.error("func test failed: %s", e)
            print(json.dumps({"error": str(e)}))
            return 1
        if mode == "db":
            from big_data_lab_three_spark.sources.sinks import (
                write_predictions_redis,
            )

            preds = mm.models[model].transform(test)
            result["db"] = write_predictions_redis(preds)
        print(json.dumps(result))
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
