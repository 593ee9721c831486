"""Validated settings contract (reference src/config.py:88-217).

The reference centralizes every runtime knob in one validated
Settings tree loaded from a YAML file (ENV_PATH) with per-section
models and field/model validators; modules import the global
``settings`` instance. This module reproduces that contract on
pydantic v2, re-sectioned for a Spark engine:

- ``spark``     replaces the reference's DatabaseConfig: the engine's
                execution substrate is a SparkSession, not a DuckDB
                file. Knobs map 1:1 onto the SPARK_GRAFT_* env vars
                the session layer already honors.
- ``sql``       row_limit / query_timeout_ms (reference defaults 200
                and 8000, both must be positive).
- ``data_quality`` default_limit / max_limit / default_sigma with the
                reference's cross-field rule default_limit <= max_limit.
- ``llm``       provider selection incl. a hermetic ``stub`` provider
                (this sandbox has no network); key-presence warnings
                mirror the reference's lazy validation.
- ``server`` / ``logging`` / ``git`` / ``data`` / ``orchestration``
                as in the reference.

Loading order: explicit kwargs > YAML file (ENV_PATH, default
``.env.yaml`` when present) > defaults. ``inspect_settings()`` dumps
the tree for docs parity with SETTINGS_DOCUMENTATION.md.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Any, Literal

from pydantic import BaseModel, Field, field_validator, model_validator

logger = logging.getLogger(__name__)


class SparkConfig(BaseModel):
    """Execution-substrate knobs (the Spark analogue of the
    reference's DatabaseConfig)."""

    master: str | None = Field(
        default=None, description="Spark master; None -> local[cpus]")
    cpus: int = Field(default=32, description="local[N] parallelism")
    shuffle_partitions: int | None = Field(
        default=None, description="spark.sql.shuffle.partitions; "
        "None -> cpus (local) / cluster default")
    driver_memory: str = Field(default="8g")
    warehouse_schema: str = Field(
        default="main", description="Default schema for catalog ops")

    @field_validator("cpus")
    @classmethod
    def _positive_cpus(cls, v: int) -> int:
        if v <= 0:
            raise ValueError("cpus must be positive")
        return v

    @field_validator("driver_memory")
    @classmethod
    def _mem_format(cls, v: str) -> str:
        if not v or v[-1].lower() not in "kmgt" or not v[:-1].isdigit():
            raise ValueError("driver_memory must look like '8g', '512m'")
        return v


class SQLConfig(BaseModel):
    row_limit: int = Field(default=200)
    query_timeout_ms: int = Field(default=8000)

    @field_validator("row_limit", "query_timeout_ms")
    @classmethod
    def _positive(cls, v: int) -> int:
        if v <= 0:
            raise ValueError("value must be positive")
        return v


class DataQualityConfig(BaseModel):
    default_limit: int = Field(default=10_000)
    max_limit: int = Field(default=200_000)
    default_sigma: float = Field(default=3.0)

    @field_validator("default_limit", "max_limit")
    @classmethod
    def _positive(cls, v: int) -> int:
        if v <= 0:
            raise ValueError("value must be positive")
        return v

    @field_validator("default_sigma")
    @classmethod
    def _positive_sigma(cls, v: float) -> float:
        if v <= 0:
            raise ValueError("sigma must be positive")
        return v

    @model_validator(mode="after")
    def _limits_ordered(self) -> "DataQualityConfig":
        if self.default_limit > self.max_limit:
            raise ValueError("default_limit cannot exceed max_limit")
        return self


class LLMConfig(BaseModel):
    provider: Literal["openai", "openrouter", "ollama", "stub"] = Field(
        default="stub")
    model: str = Field(default="gpt-4o-mini")
    openai_api_key: str | None = Field(default=None)
    openrouter_api_key: str | None = Field(default=None)
    ollama_base_url: str = Field(default="http://localhost:11434")

    @model_validator(mode="after")
    def _warn_missing_keys(self) -> "LLMConfig":
        needed = {"openai": self.openai_api_key,
                  "openrouter": self.openrouter_api_key}
        if self.provider in needed and not needed[self.provider]:
            logger.warning(
                "%s provider selected but its API key is unset; "
                "set it before making requests", self.provider)
        return self


class ServerConfig(BaseModel):
    host: str = Field(default="0.0.0.0")
    port: int = Field(default=8000)

    @field_validator("port")
    @classmethod
    def _port_range(cls, v: int) -> int:
        if not 1 <= v <= 65535:
            raise ValueError("port must be between 1 and 65535")
        return v


class LoggingConfig(BaseModel):
    level: str = Field(default="INFO")
    format: str = Field(
        default="%(asctime)s | %(levelname)s | %(name)s | %(message)s")
    datefmt: str = Field(default="%Y-%m-%d %H:%M:%S")

    @field_validator("level")
    @classmethod
    def _known_level(cls, v: str) -> str:
        levels = {"DEBUG", "INFO", "WARNING", "ERROR", "CRITICAL"}
        if v.upper() not in levels:
            raise ValueError(f"log level must be one of {sorted(levels)}")
        return v.upper()


class GitConfig(BaseModel):
    dbt_dir: Path = Field(default=Path("dbt"))
    github_token: str | None = Field(default=None)
    github_repo: str | None = Field(default=None)
    default_branch: str = Field(default="main")
    author_name: str = Field(default="Data Platform Copilot")
    author_email: str = Field(default="bot@example.com")

    @field_validator("github_repo")
    @classmethod
    def _owner_slash_repo(cls, v: str | None) -> str | None:
        if v and "/" not in v:
            raise ValueError("github_repo must be 'owner/repo'")
        return v


class DataConfig(BaseModel):
    data_dir: Path | None = Field(
        default=None, description="Warehouse parquet directory "
        "(e.g. a testdata sf dir)")
    demo_data_dir: Path = Field(
        default=Path("demo_data"),
        description="Server-side directory the /namespace/demo-upload "
        "route ingests *.csv from (fixed path, never client-supplied; "
        "reference src/config.py:17 DemoDataPath)")


class OrchestrationConfig(BaseModel):
    orchestrator_api: str = Field(default="http://localhost:4200/api")


class Settings(BaseModel):
    spark: SparkConfig = Field(default_factory=SparkConfig)
    sql: SQLConfig = Field(default_factory=SQLConfig)
    data_quality: DataQualityConfig = Field(default_factory=DataQualityConfig)
    llm: LLMConfig = Field(default_factory=LLMConfig)
    server: ServerConfig = Field(default_factory=ServerConfig)
    logging: LoggingConfig = Field(default_factory=LoggingConfig)
    git: GitConfig = Field(default_factory=GitConfig)
    data: DataConfig = Field(default_factory=DataConfig)
    orchestration: OrchestrationConfig = Field(
        default_factory=OrchestrationConfig)

    @classmethod
    def from_yaml(cls, yaml_file: Path | str,
                  encoding: str = "utf-8") -> "Settings":
        import yaml
        with Path(yaml_file).open("r", encoding=encoding) as f:
            payload = yaml.safe_load(f) or {}
        return cls.model_validate(payload)

    def get_config_summary(self) -> dict[str, dict[str, Any]]:
        """Full tree dump with secrets masked (docs / debugging)."""
        dump = self.model_dump()
        for section, key in (("llm", "openai_api_key"),
                             ("llm", "openrouter_api_key"),
                             ("git", "github_token")):
            if dump[section].get(key):
                dump[section][key] = "***"
        return dump


def _load() -> Settings:
    env_path = os.environ.get("ENV_PATH", ".env.yaml")
    if Path(env_path).exists():
        return Settings.from_yaml(env_path)
    return Settings()


settings = _load()


def inspect_settings() -> dict[str, dict[str, Any]]:
    return settings.get_config_summary()
