"""LLM completion providers (A23 dispatch, reference src/provider.py).

The engine never depends on a live LLM: ``CompletionProvider`` is a
tiny protocol, ``StubProvider`` serves tests/offline use (the test
strategy keeps the LLM out of the loop — SURVEY.md §5), and the HTTP
providers (openai-compatible chat-completions, reference
src/provider.py:17-100) are import-gated since this container has no
network.

Decoding defaults mirror the reference: temperature 0.05, top_p 0.9,
max_tokens 800 (src/provider.py:6-10).
"""

from __future__ import annotations

from typing import Protocol

GEN_PARAMS = {"temperature": 0.05, "top_p": 0.9, "max_tokens": 800}


class CompletionProvider(Protocol):
    async def complete(self, system: str, user: str) -> str:
        """Return the model's raw (markdown) completion."""
        ...


class StubProvider:
    """Deterministic provider for tests: returns canned completions
    keyed by substring match (most-specific — longest — key wins when
    several match: prompts embed schema docs, whose table/view names
    can collide with short keys), else a fallback."""

    def __init__(self, canned: dict[str, str] | None = None,
                 fallback: str = "```sql\nSELECT 1 AS one\n```") -> None:
        self.canned = canned or {}
        self.fallback = fallback
        self.calls: list[tuple[str, str]] = []

    async def complete(self, system: str, user: str) -> str:
        self.calls.append((system, user))
        hits = [key for key in self.canned if key in user]
        if hits:
            return self.canned[max(hits, key=len)]
        return self.fallback


def make_provider(llm) -> CompletionProvider:
    """Provider dispatch from an ``LLMConfig`` (reference
    src/provider.py:103-117's get_provider): stub stays hermetic; the
    three HTTP providers share the chat-completions wire format and
    differ only in base URL / key / timeout (the reference gives each
    transport its own budget — 30 s openai, 45 s openrouter, 60 s
    local ollama; src/provider.py:36,65,86)."""
    if llm.provider == "stub":
        return StubProvider()
    if llm.provider == "openai":
        return OpenAICompatProvider("https://api.openai.com/v1",
                                    llm.openai_api_key, llm.model,
                                    timeout_s=30.0)
    if llm.provider == "openrouter":
        return OpenAICompatProvider("https://openrouter.ai/api/v1",
                                    llm.openrouter_api_key, llm.model,
                                    timeout_s=45.0)
    return OpenAICompatProvider(llm.ollama_base_url.rstrip("/") + "/v1",
                                None, llm.model, timeout_s=60.0)


class OpenAICompatProvider:
    """Chat-completions over HTTP (openai/openrouter/ollama-compatible).
    Instantiation requires httpx; kept import-gated for offline envs."""

    def __init__(self, base_url: str, api_key: str | None,
                 model: str, timeout_s: float = 30.0) -> None:
        import httpx  # noqa: F401 — fail fast when unavailable
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key
        self.model = model
        self.timeout_s = timeout_s

    async def complete(self, system: str, user: str) -> str:
        import httpx
        headers = {"Content-Type": "application/json"}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        payload = {
            "model": self.model,
            "messages": [{"role": "system", "content": system},
                         {"role": "user", "content": user}],
            **GEN_PARAMS,
        }
        async with httpx.AsyncClient(timeout=self.timeout_s) as client:
            r = await client.post(f"{self.base_url}/chat/completions",
                                  json=payload, headers=headers)
            r.raise_for_status()
            return r.json()["choices"][0]["message"]["content"]
