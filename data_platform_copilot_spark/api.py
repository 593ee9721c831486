"""Top-level convenience API — one import for engine users.

    from data_platform_copilot_spark import api

    spark = api.get_spark()
    api.register_testdata(spark, "/root/testdata/sf0.01")
    api.sql_run(spark, "SELECT ...")
"""

from .catalog import (  # noqa: F401
    NamespaceManager,
    TableManager,
    build_markdown,
    normalize_schema_name,
    write_schema_docs,
)
from .chain import (  # noqa: F401
    StubProvider,
    agent_answer,
    make_plan,
    nl_to_sql,
    refine,
    similar_fields,
)
from .dq import (  # noqa: F401
    DQRule,
    fetch_table_sample,
    profile_df,
    render_markdown_report,
    run_checks,
)
from .gateway import (  # noqa: F401
    IncorrectQuestionError,
    extract_sql_from_markdown,
    is_safe,
    sql_run,
    validate_sql,
)
from .metrics import REGISTRY  # noqa: F401
from .operators import (  # noqa: F401
    brute_force_topk,
    embedding_near_duplicates,
    exact_duplicates,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    shingles,
    simhash,
    srp_lsh_topk,
)
from .operators.asof import asof_join_backward  # noqa: F401
from .operators.rangejoin import range_join  # noqa: F401
from .queries import ORACLE, QUERIES  # noqa: F401
from .service import CopilotService, create_fastapi_app  # noqa: F401
from .session import get_spark  # noqa: F401
from .sources import load_table, register_testdata  # noqa: F401
