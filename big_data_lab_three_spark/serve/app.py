"""Serving layer — V1/V2 parity (SURVEY.md §2.11), FastAPI + Redis
read-through cache (S5) + working upload scoring (fixing the
reference's dangling ``predict_upload`` endpoint, S10).

Differences from the reference, by design (SURVEY.md §4.3):
- ONE SparkSession and model registry for the process — the reference
  constructs a ``MultiModel``/``Predictor`` per HTTP request
  (``src/app.py:54``), re-reading and re-fitting everything.
- ``upload`` mode actually works: CSV bytes → Spark DataFrame →
  conform to the trained contract → score (the reference's endpoint
  500s because ``predict_upload`` does not exist —
  ``src/app.py:97,120-124``).

FastAPI/redis are optional imports (not baked into every container);
``create_app`` raises a clear error if FastAPI is missing, and caching
degrades to a no-op without Redis — mirroring the reference's graceful
degradation.
"""

from __future__ import annotations

import io
import json

from pyspark.sql import functions as F

from big_data_lab_three_spark.catalog import Catalog
from big_data_lab_three_spark.logger import get_logger
from big_data_lab_three_spark.ml import MultiModel
from big_data_lab_three_spark.schemas import conform
from big_data_lab_three_spark.session import get_spark
from big_data_lab_three_spark.sources.sinks import redis_client

log = get_logger(__name__)

VALID_MODELS = ("d_tree", "rand_forest", "log_reg", "gnb")


class _Cache:
    """S5 — Redis read-through cache on ``predict:{mode}`` keys
    (reference ``src/app.py:98-115``); silently disabled without a
    reachable Redis."""

    def __init__(self) -> None:
        self.conn = redis_client()
        if self.conn is not None:
            try:
                self.conn.ping()
            except Exception:  # noqa: BLE001
                self.conn = None

    def get(self, key: str):
        if self.conn is None:
            return None
        raw = self.conn.get(key)
        return json.loads(raw) if raw else None

    def set(self, key: str, value: dict) -> None:
        if self.conn is not None:
            self.conn.set(key, json.dumps(value))


class Service:
    """Framework-free core so the API logic is testable without
    FastAPI: ``train`` and ``predict`` implement V1/V2 semantics."""

    def __init__(self, sf_dir: str = "/root/testdata/sf0.001") -> None:
        self.spark = get_spark("serve")
        self.catalog = Catalog()
        self.cache = _Cache()
        from big_data_lab_three_spark.cli import _labeled_testdata

        df, feats = _labeled_testdata(self.spark, sf_dir)
        train, test = df.randomSplit([0.7, 0.3], seed=42)
        self.feature_cols = feats
        self.mm = MultiModel(
            self.spark, train, test, feats, catalog=self.catalog
        )

    def train(
        self,
        model_type: str = "d_tree",
        save_model: bool = True,
        params: dict | None = None,
        predict_flag: bool = False,
    ) -> dict:
        """V1 — POST /train/ behavior: unknown type → ValueError
        (mapped to 400), result dict matches the reference's
        ``{model_trained, model_type, model_saved}``."""
        if model_type not in VALID_MODELS:
            raise ValueError(f"unknown model type: {model_type}")
        ok = self.mm.train(model_type, params or {}, save=save_model)
        result = {
            "model_trained": ok,
            "model_type": model_type,
            "model_saved": bool(save_model and ok),
        }
        if predict_flag:
            result["test_score"] = self.mm.predict(model_type)["test_score"]
        return result

    def predict(
        self,
        mode: str = "smoke",
        model_type: str = "d_tree",
        file_contents: bytes | None = None,
    ) -> dict:
        """V2 — POST /predict/: read-through cache; smoke scores the
        held-out split, upload scores caller-supplied CSV bytes."""
        cache_key = f"predict:{mode}"
        if mode != "upload":
            cached = self.cache.get(cache_key)
            if cached is not None:
                return {"from_cache": True, **cached}

        if model_type not in self.mm.models:
            self.mm.train(model_type, save=False)

        if mode == "smoke":
            result = self.mm.predict(model_type, mode)
        elif mode == "upload":
            if file_contents is None:
                raise ValueError("upload mode requires file contents")
            result = self._predict_upload(model_type, file_contents)
        else:
            raise ValueError(f"unknown mode: {mode}")

        self.cache.set(cache_key, result)
        return {"from_cache": False, **result}

    def _predict_upload(self, model_type: str, file_contents: bytes) -> dict:
        """S10 fixed: CSV bytes → DataFrame → conform to contract →
        score.  Small request-sized frames — driver-local parallelize is
        the right plan here, not a distributed read."""
        import pandas as pd

        pdf = pd.read_csv(io.BytesIO(file_contents))
        df = self.spark.createDataFrame(pdf)
        scored = self.mm.models[model_type].transform(
            conform(df, self.feature_cols)
        )
        preds = [int(r["prediction"]) for r in
                 scored.select("prediction").collect()]
        return {
            "model": model_type,
            "mode": "upload",
            "n_rows": len(preds),
            "predictions": preds,
        }


def create_app(sf_dir: str = "/root/testdata/sf0.001"):
    """Build the FastAPI app (import-gated: raises ImportError with a
    clear message when FastAPI isn't installed)."""
    from fastapi import FastAPI, HTTPException, UploadFile

    app = FastAPI(title="big_data_lab_three_spark")
    service = Service(sf_dir)

    @app.post("/train/")
    def train(
        model_type: str = "d_tree",
        save_model: bool = True,
        predict_flag: bool = False,
    ):
        try:
            return service.train(
                model_type, save_model, predict_flag=predict_flag
            )
        except ValueError as e:
            raise HTTPException(status_code=400, detail=str(e)) from e
        except Exception as e:  # noqa: BLE001
            raise HTTPException(status_code=500, detail=str(e)) from e

    @app.post("/predict/")
    async def predict(mode: str = "smoke", file: UploadFile | None = None):
        try:
            contents = await file.read() if file is not None else None
            return service.predict(mode, file_contents=contents)
        except ValueError as e:
            raise HTTPException(status_code=400, detail=str(e)) from e
        except Exception as e:  # noqa: BLE001
            raise HTTPException(status_code=500, detail=str(e)) from e

    return app
