"""Framework configuration.

The reference uses a DataJoint JSON config (``~/.datajoint_config.json``,
example at reference Example_dj_local_conf.json:1-38) with database credentials,
a blob/file store definition (``stores.localattach``), and custom keys
(``database.prefix``, ``pose_project_dir``).

We keep the same tiered shape with a local-first backend:

- ``config["database.path"]``: SQLite database file (the job/metadata store;
  replaces the MySQL server at reference datajoint_docker/docker-compose.yaml:9).
- ``config["stores"]["localattach"]["location"]``: managed file store for
  ``attach@localattach`` attributes.
- ``config["custom"]``: free-form, mirrors reference usage
  (``database.prefix``, ``pose_project_dir``).

Config resolution order: explicit ``config.load(path)`` > ``$PPT_CONFIG`` file >
``./pose_pipeline_tpu_conf.json`` > ``~/.pose_pipeline_tpu_conf.json`` > defaults.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict


class Config(dict):
    """A dict with attribute-style helpers and JSON persistence."""

    def load(self, path: str) -> "Config":
        with open(path) as f:
            self.update(json.load(f))
        return self

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self, f, indent=2, default=str)

    @property
    def database_path(self) -> str:
        return self.get("database.path", os.path.join(os.getcwd(), "pose_pipeline_tpu.db"))

    @property
    def store_location(self) -> str:
        stores = self.get("stores", {})
        loc = stores.get("localattach", {}).get("location")
        return loc or os.path.join(os.getcwd(), "pose_pipeline_tpu_store")

    @property
    def database_prefix(self) -> str:
        return self.get("custom", {}).get("database.prefix", "")


def _default_config() -> Config:
    cfg = Config()
    cfg["custom"] = {}
    for candidate in (
        os.environ.get("PPT_CONFIG"),
        os.path.join(os.getcwd(), "pose_pipeline_tpu_conf.json"),
        os.path.expanduser("~/.pose_pipeline_tpu_conf.json"),
    ):
        if candidate and os.path.isfile(candidate):
            try:
                cfg.load(candidate)
                break
            except (OSError, json.JSONDecodeError):
                pass
    return cfg


config: Config = _default_config()


def set_database_path(path: str) -> None:
    config["database.path"] = path


def set_store_location(path: str) -> None:
    config.setdefault("stores", {})["localattach"] = {"protocol": "file", "location": path}
