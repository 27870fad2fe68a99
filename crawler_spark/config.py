"""Config sources (A10) — layered settings like the reference's
config/settings.py:74-144: packaged defaults ← defaults.json ←
{domain}_config.json ← environment overrides (SPARK_CRAWLER_*).

Driver-side dicts; anything needed on executors travels as broadcast
variables or literal columns (never per-row lookups)."""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any

# reference defaults (config/settings.py + .env)
DEFAULTS: dict[str, Any] = {
    "max_depth": 5,          # settings.py:54
    "max_threads": 4,        # settings.py:53 — informational; Spark sizes tasks
    "crawl_delay": 1.0,      # .env:9
    "max_retries": 3,        # settings.py:57
    "checkpoint_interval_s": 300,  # settings.py:59
    "respect_robots": True,
    "epoch_seconds": 60.0,
    "epoch_budget": None,
    "num_buckets": 64,
    "salt_buckets": 8,
    "use_bloom": False,
    "bloom_fpp": 0.01,
    "user_agents": 6,        # reference ships 6 UA strings, utils/http.py:30-37
}

ENV_PREFIX = "SPARK_CRAWLER_"


def _coerce(value: str, like: Any) -> Any:
    if isinstance(like, bool):
        return value.lower() in ("1", "true", "yes", "on")
    if isinstance(like, int) and not isinstance(like, bool):
        return int(value)
    if isinstance(like, float):
        return float(value)
    return value


def load_config(
    config_dir: str | Path | None = None, domain: str | None = None
) -> dict[str, Any]:
    """defaults ← defaults.json ← {domain}_config.json ← env vars."""
    cfg = dict(DEFAULTS)
    if config_dir is not None:
        d = Path(config_dir)
        for name in ["defaults.json"] + (
            [f"{domain}_config.json"] if domain else []
        ):
            p = d / name
            if p.exists():
                cfg.update(json.loads(p.read_text()))
    for key, default in DEFAULTS.items():
        env = os.environ.get(ENV_PREFIX + key.upper())
        if env is not None:
            cfg[key] = _coerce(env, default)
    return cfg


def to_epoch_config(cfg: dict[str, Any]):
    from .epoch import EpochConfig

    return EpochConfig(
        max_depth=cfg["max_depth"],
        max_retries=cfg["max_retries"],
        epoch_seconds=cfg["epoch_seconds"],
        epoch_budget=cfg["epoch_budget"],
        num_buckets=cfg["num_buckets"],
        salt_buckets=cfg["salt_buckets"],
        respect_robots=cfg["respect_robots"],
        use_bloom=cfg["use_bloom"],
        bloom_fpp=cfg["bloom_fpp"],
    )
