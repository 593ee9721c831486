"""A29/A30 — GitHub PR automation + orchestrator REST clients.

Engine-independent ports (reference src/github_client.py:27-85,
src/orchestrator.py:22-61). Both clients take an injectable async
``request`` callable so the logic is testable without httpx or a
network; ``http_requester`` builds the real transport when httpx is
available.
"""

from __future__ import annotations

from collections.abc import Awaitable, Callable
from typing import Any

# request(method, url, json=None, headers=None) -> (status, json_body)
Requester = Callable[..., Awaitable[tuple[int, dict[str, Any]]]]


def http_requester(timeout_s: float = 30.0) -> Requester:
    import httpx  # import-gated: not bundled in this container

    async def request(method: str, url: str, json: dict | None = None,
                      headers: dict | None = None) -> tuple[int, dict]:
        # Transport failures (connect refused, DNS, timeout) surface
        # as RuntimeError so the service's uniform RuntimeError -> 400
        # mapping holds; the default orchestrator_api points at a
        # Prefect that may simply not be running on this box.
        try:
            async with httpx.AsyncClient(timeout=timeout_s) as client:
                r = await client.request(method, url, json=json,
                                         headers=headers)
        except (httpx.HTTPError, OSError) as exc:
            raise RuntimeError(
                f"{method} {url} transport failure: {exc}") from exc
        if not r.content:
            return r.status_code, {}
        try:
            body = r.json()
        except ValueError:
            # non-JSON body (a proxy's HTML 502 page, plain text):
            # surface status + snippet instead of letting
            # JSONDecodeError escape the RuntimeError -> 400 mapping
            body = {"error": "non-JSON response", "body": r.text[:500]}
        return r.status_code, body
    return request


class GitHubClient:
    """Create branch -> upsert files -> open PR (reference
    src/github_client.py). 422-on-existing-branch is tolerated; file
    upsert probes for an existing sha first."""

    def __init__(self, request: Requester, repo: str, token: str,
                 api_base: str = "https://api.github.com") -> None:
        self.request = request
        self.repo = repo
        self.base = api_base.rstrip("/")
        self.headers = {"Authorization": f"Bearer {token}",
                        "Accept": "application/vnd.github+json"}

    async def _branch_sha(self, branch: str) -> str:
        status, body = await self.request(
            "GET", f"{self.base}/repos/{self.repo}/git/ref/heads/{branch}",
            headers=self.headers)
        if status != 200:
            raise RuntimeError(f"ref lookup failed: {status}")
        return body["object"]["sha"]

    async def create_branch(self, new_branch: str, from_branch: str) -> None:
        sha = await self._branch_sha(from_branch)
        status, body = await self.request(
            "POST", f"{self.base}/repos/{self.repo}/git/refs",
            json={"ref": f"refs/heads/{new_branch}", "sha": sha},
            headers=self.headers)
        if status == 422:  # already exists — reference tolerates this
            return
        if status not in (200, 201):
            raise RuntimeError(f"branch create failed: {status} {body}")

    async def upsert_file(self, branch: str, path: str, content_b64: str,
                          message: str) -> None:
        url = f"{self.base}/repos/{self.repo}/contents/{path}"
        status, body = await self.request(
            "GET", f"{url}?ref={branch}", headers=self.headers)
        payload = {"message": message, "content": content_b64,
                   "branch": branch}
        if status == 200 and "sha" in body:
            payload["sha"] = body["sha"]  # update, not create
        status, body = await self.request("PUT", url, json=payload,
                                          headers=self.headers)
        if status not in (200, 201):
            raise RuntimeError(f"file upsert failed: {status} {body}")

    async def open_pr(self, head: str, base: str, title: str,
                      body_text: str = "") -> dict[str, Any]:
        status, body = await self.request(
            "POST", f"{self.base}/repos/{self.repo}/pulls",
            json={"title": title, "head": head, "base": base,
                  "body": body_text},
            headers=self.headers)
        if status not in (200, 201):
            raise RuntimeError(f"PR create failed: {status} {body}")
        return body


class OrchestratorClient:
    """Prefect-style REST client (reference src/orchestrator.py:22-61):
    discover a deployment by flow name, create a flow run, poll its
    status. The flows themselves submit Spark jobs (pipelines.py)."""

    def __init__(self, request: Requester, api_url: str) -> None:
        self.request = request
        self.api = api_url.rstrip("/")

    async def find_deployment(self, flow_name: str) -> str:
        status, body = await self.request(
            "POST", f"{self.api}/deployments/filter",
            json={"flows": {"name": {"any_": [flow_name]}}})
        if status != 200 or not body.get("deployments"):
            raise RuntimeError(f"no deployment for flow {flow_name!r}")
        return body["deployments"][0]["id"]

    async def run_flow(self, flow_name: str,
                       parameters: dict | None = None) -> str:
        dep = await self.find_deployment(flow_name)
        status, body = await self.request(
            "POST", f"{self.api}/deployments/{dep}/create_flow_run",
            json={"parameters": parameters or {}})
        if status not in (200, 201):
            raise RuntimeError(f"flow run failed: {status}")
        return body["id"]

    async def get_status(self, run_id: str) -> str:
        status, body = await self.request(
            "GET", f"{self.api}/flow_runs/{run_id}")
        if status != 200:
            raise RuntimeError(f"status lookup failed: {status}")
        return body.get("state", {}).get("type", "UNKNOWN")
