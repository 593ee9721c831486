from .agent import AgentResult, agent_answer
from .chain import nl_to_sql, refine
from .plan import make_plan, similar_fields
from .provider import CompletionProvider, StubProvider, make_provider

__all__ = [
    "AgentResult",
    "CompletionProvider",
    "StubProvider",
    "agent_answer",
    "make_plan",
    "make_provider",
    "nl_to_sql",
    "refine",
    "similar_fields",
]
