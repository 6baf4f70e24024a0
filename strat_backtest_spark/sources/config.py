"""Config source (SURVEY.md §2.1 S8).

The reference reads ``config.ini`` at import time through a module-level
``configparser`` embedded in a frozen dataclass (reddit_data/
common_stock.py:27-43, config.py:1-6), with the file section FAVORED
over constructor parameters.  The engine keeps that precedence rule but
drops the import-time I/O (SURVEY §6 anti-pattern list): configs are
loaded lazily, and the same keys can be supplied through ``spark.conf``
(``spark.strat_backtest.reddit.*``) so a cluster job can be configured
without shipping an ini file to every node — driver-side config is the
Spark-idiomatic channel.

Precedence, highest first: config.ini section > spark.conf > call-site
parameter — identical observable behavior to the reference when an ini
file is present.
"""

from __future__ import annotations

import configparser
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

from pyspark.sql import SparkSession

CONFIG_FILENAME = "config.ini"
_SPARK_CONF_PREFIX = "spark.strat_backtest.reddit."

# ini key -> attribute, as in the reference's [REDDIT] section
_REDDIT_KEYS = {"API_KEY": "app_id", "SECRET": "secret", "USER_AGENT": "user_agent"}


@dataclass(frozen=True)
class RedditConfig:
    """Credentials for the Reddit source adapter (S7).

    Mirrors the reference's ``RedditConfig`` (common_stock.py:27-43)
    minus the import-time file read.
    """

    app_id: Optional[str] = None
    secret: Optional[str] = None
    user_agent: Optional[str] = None

    @property
    def complete(self) -> bool:
        return None not in (self.app_id, self.secret, self.user_agent)


def load_reddit_config(
    path: Optional[str] = None,
    spark: Optional[SparkSession] = None,
    **params: Optional[str],
) -> RedditConfig:
    """Resolve Reddit credentials.

    ``path`` defaults to ``./config.ini`` (the reference's
    ``CONFIG_PATH``, config.py:6).  Section values override ``spark.conf``
    values, which override keyword parameters — "CONFIG WILL BE FAVORED
    OVER PARAMETERS" (common_stock.py:33).
    """
    resolved = {k: params.get(k) for k in ("app_id", "secret", "user_agent")}

    if spark is not None:
        for attr in resolved:
            v = spark.conf.get(_SPARK_CONF_PREFIX + attr, None)
            if v:
                resolved[attr] = v

    ini = Path(path) if path is not None else Path.cwd() / CONFIG_FILENAME
    if ini.is_file():
        parser = configparser.ConfigParser()
        parser.read(str(ini))
        if parser.has_section("REDDIT"):
            for key, attr in _REDDIT_KEYS.items():
                if parser.has_option("REDDIT", key):
                    resolved[attr] = parser.get("REDDIT", key)

    return RedditConfig(**resolved)
