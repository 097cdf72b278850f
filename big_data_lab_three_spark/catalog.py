"""Config-as-catalog (SURVEY.md S8).

The reference uses ``config.ini`` as both startup config AND a mutable
catalog: preprocessing writes a ``[PREPROCESSED_DATA]`` section with
output paths (``src/preprocess.py:122-161``), training writes per-model
sections with hyperparameters and artifact paths
(``src/train.py:161-171``).  This module keeps that INI-compatible
contract (section names included: ``[DATA]``, ``[PREPROCESSED_DATA]``,
``[D_TREE]``, ``[RAND_FOREST]``, ``[LOG_REG]``, ``[GNB]``, ...) while
living entirely on the driver — catalog metadata is kilobytes, never a
distributed concern.
"""

from __future__ import annotations

import configparser
import os
import tempfile


class Catalog:
    """INI-backed mutable catalog with the reference's read/write-back
    behavior and its permission-fallback artifact-dir resolution
    (``src/train.py:75-92``: env override → preferred dir → tmpdir)."""

    def __init__(self, path: str = "config.ini") -> None:
        self.path = path
        self.config = configparser.ConfigParser()
        if os.path.exists(path):
            self.config.read(path)

    def get(self, section: str, option: str, fallback: str | None = None):
        return self.config.get(section, option, fallback=fallback)

    def set_section(self, section: str, values: dict[str, object]) -> None:
        """Create/overwrite a section and persist (the reference rewrites
        ``config.ini`` in place after every stage,
        ``src/preprocess.py:156-161``)."""
        if not self.config.has_section(section):
            self.config.add_section(section)
        for k, v in values.items():
            self.config.set(section, str(k), str(v))
        self.save()

    def save(self) -> None:
        with open(self.path, "w", encoding="utf-8") as f:
            self.config.write(f)

    def sections(self) -> list[str]:
        return self.config.sections()


def resolve_artifact_dir(
    preferred: str = "experiments", env_var: str = "ARTIFACT_DIR"
) -> str:
    """Permission-fallback artifact dir: $ARTIFACT_DIR → preferred →
    tmpdir (reference ``src/train.py:75-92``)."""
    for candidate in (os.environ.get(env_var), preferred):
        if not candidate:
            continue
        try:
            os.makedirs(candidate, exist_ok=True)
            probe = os.path.join(candidate, ".write_probe")
            with open(probe, "w") as f:
                f.write("")
            os.remove(probe)
            return candidate
        except OSError:
            continue
    return tempfile.mkdtemp(prefix="artifacts_")
