"""Property-based tests (hypothesis) for the pure gateway/naming
functions — the components every query passes through."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from data_platform_copilot_spark.catalog.naming import (
    FALLBACK_NAME,
    MAX_IDENT_LEN,
    normalize_schema_name,
)
from data_platform_copilot_spark.chain.dbt import sanitize_model_name
from data_platform_copilot_spark.dq.sampler import MAX_LIMIT, clamp_limit
from data_platform_copilot_spark.gateway import (
    IncorrectQuestionError,
    extract_sql_from_markdown,
    is_safe,
    validate_sql,
)

IDENT_RE = re.compile(r"^[a-z][a-z0-9_]*$")


class TestNamingProperties:
    @given(st.text(max_size=200))
    @settings(max_examples=300)
    def test_normalized_name_is_valid_identifier(self, s):
        out = normalize_schema_name(s)
        assert out == FALLBACK_NAME or IDENT_RE.match(out), out
        assert len(out) <= MAX_IDENT_LEN

    @given(st.text(max_size=200))
    @settings(max_examples=200)
    def test_normalization_idempotent(self, s):
        once = normalize_schema_name(s)
        assert normalize_schema_name(once) == once

    @given(st.text(max_size=100))
    def test_model_name_valid(self, s):
        out = sanitize_model_name(s)
        assert re.match(r"^[a-z_][a-z0-9_]*$", out)
        assert len(out) <= 63


class TestGatewayProperties:
    @given(st.text(max_size=500))
    @settings(max_examples=300)
    def test_fence_roundtrip(self, body):
        if "```" in body:
            return
        assert extract_sql_from_markdown(
            f"prefix\n```sql\n{body}\n```\nsuffix") == body.strip()

    @given(st.text(max_size=300))
    @settings(max_examples=500)
    def test_is_safe_implies_validate_accepts(self, s):
        ok, _ = is_safe(s)
        if ok:
            # validate_sql must not reject anything is_safe blessed
            validate_sql(s.strip().strip("`"))

    @given(st.text(max_size=300))
    @settings(max_examples=500)
    def test_validate_never_passes_forbidden(self, s):
        try:
            out = validate_sql(s)
        except IncorrectQuestionError:
            return
        assert re.match(r"^\s*select\b", out, re.IGNORECASE)
        assert not re.search(
            r"\b(insert|update|delete|create|drop|alter|attach|copy"
            r"|pragma|export|import)\b", out, re.IGNORECASE)


class TestSamplerProperties:
    @given(st.one_of(st.none(), st.integers(-10**9, 10**9)))
    def test_clamp_always_in_bounds(self, n):
        out = clamp_limit(n)
        assert 1 <= out <= MAX_LIMIT


class TestCodecProperties:
    @given(st.lists(st.integers(min_value=-32768, max_value=32767),
                    min_size=1, max_size=300),
           st.sampled_from([8000, 16000, 44100]))
    @settings(max_examples=50)
    def test_wav_roundtrip_any_mono_pcm16(self, samples, rate):
        from data_platform_copilot_spark.operators import wav
        frames = [(s,) for s in samples]
        r, ch, bits, back = wav.decode(wav.encode(rate, 1, 16, frames))
        assert (r, ch, bits) == (rate, 1, 16)
        assert back == frames

    @given(st.integers(min_value=1, max_value=9),
           st.integers(min_value=1, max_value=9),
           st.integers(min_value=1, max_value=5),
           st.integers(min_value=0, max_value=255))
    @settings(max_examples=30)
    def test_avi_roundtrip_any_dims(self, w, h, n, seed):
        from data_platform_copilot_spark.operators import avi
        frames = [[bytearray((x * 7 + y * 3 + t + seed) % 256
                             for x in range(w) for _ in range(3))
                   for y in range(h)]
                  for t in range(n)]
        w2, h2, fps, back = avi.decode(avi.encode(w, h, 5, frames))
        assert (w2, h2) == (w, h)
        assert [bytes(r) for f in back for r in f] == \
               [bytes(r) for f in frames for r in f]
