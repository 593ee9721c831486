"""Settings contract (reference src/config.py:88-217): validators,
YAML loading, masking, and consumer wiring."""

from __future__ import annotations

import pytest
from pydantic import ValidationError

from data_platform_copilot_spark.config import (
    DataQualityConfig,
    GitConfig,
    LoggingConfig,
    ServerConfig,
    Settings,
    SparkConfig,
    SQLConfig,
)


class TestValidators:
    def test_defaults_match_reference(self):
        s = Settings()
        assert s.sql.row_limit == 200
        assert s.sql.query_timeout_ms == 8000
        assert s.data_quality.default_limit == 10_000
        assert s.data_quality.max_limit == 200_000
        assert s.data_quality.default_sigma == 3.0
        assert s.server.port == 8000
        assert s.git.default_branch == "main"

    @pytest.mark.parametrize("field,bad", [
        ("row_limit", 0), ("row_limit", -5), ("query_timeout_ms", 0)])
    def test_sql_positive(self, field, bad):
        with pytest.raises(ValidationError):
            SQLConfig(**{field: bad})

    def test_dq_cross_field_rule(self):
        with pytest.raises(ValidationError, match="max_limit"):
            DataQualityConfig(default_limit=500_000, max_limit=200_000)
        with pytest.raises(ValidationError):
            DataQualityConfig(default_sigma=0)

    def test_server_port_range(self):
        with pytest.raises(ValidationError):
            ServerConfig(port=0)
        with pytest.raises(ValidationError):
            ServerConfig(port=70000)

    def test_logging_level_normalized(self):
        assert LoggingConfig(level="debug").level == "DEBUG"
        with pytest.raises(ValidationError):
            LoggingConfig(level="LOUD")

    def test_git_repo_shape(self):
        assert GitConfig(github_repo="owner/repo").github_repo == "owner/repo"
        with pytest.raises(ValidationError):
            GitConfig(github_repo="not-a-repo")

    def test_spark_knobs(self):
        with pytest.raises(ValidationError):
            SparkConfig(cpus=0)
        with pytest.raises(ValidationError):
            SparkConfig(driver_memory="lots")
        assert SparkConfig(driver_memory="512m").driver_memory == "512m"


class TestLoadingAndSummary:
    def test_from_yaml(self, tmp_path):
        cfg = tmp_path / "env.yaml"
        cfg.write_text(
            "sql:\n  row_limit: 50\n"
            "data_quality:\n  default_sigma: 2.5\n"
            "git:\n  github_token: sekrit\n")
        s = Settings.from_yaml(cfg)
        assert s.sql.row_limit == 50
        assert s.data_quality.default_sigma == 2.5
        # untouched sections keep reference defaults
        assert s.data_quality.max_limit == 200_000

    def test_summary_masks_secrets(self):
        s = Settings.model_validate(
            {"git": {"github_token": "tok"},
             "llm": {"provider": "openai", "openai_api_key": "key"}})
        dump = s.get_config_summary()
        assert dump["git"]["github_token"] == "***"
        assert dump["llm"]["openai_api_key"] == "***"

    def test_invalid_yaml_section_rejected(self, tmp_path):
        cfg = tmp_path / "env.yaml"
        cfg.write_text("sql:\n  row_limit: -1\n")
        with pytest.raises(ValidationError):
            Settings.from_yaml(cfg)


class TestConsumerWiring:
    def test_gateway_defaults_come_from_settings(self):
        from data_platform_copilot_spark.config import settings
        from data_platform_copilot_spark.gateway import sql_runner
        assert sql_runner.DEFAULT_ROW_LIMIT == settings.sql.row_limit
        assert sql_runner.DEFAULT_TIMEOUT_MS == settings.sql.query_timeout_ms

    def test_dq_defaults_come_from_settings(self):
        from data_platform_copilot_spark.config import settings
        from data_platform_copilot_spark.dq import rules, sampler
        assert sampler.DEFAULT_LIMIT == settings.data_quality.default_limit
        assert sampler.MAX_LIMIT == settings.data_quality.max_limit
        assert rules.DEFAULT_SIGMA == settings.data_quality.default_sigma
