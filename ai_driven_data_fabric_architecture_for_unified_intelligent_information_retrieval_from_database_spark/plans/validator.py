"""Plan-level SQL validation — the sound replacement for the reference's
substring blocklist (``core/ai_query_generator.py:283-313``).

The reference rejects any SQL containing ``drop``/``create``/... *as a
substring anywhere* (``:301-302`` — which falsely rejects a column named
``updated_at``) and requires the literal substring ``employees``
(``:305-307``). Per SURVEY.md section 4.2 we instead parse the statement
with Spark's own SQL parser and validate the *logical plan*:

- the parsed tree must contain no DDL/DML/command nodes (checked against
  the parser's statement node classes, not string matching);
- every relation referenced must be in the caller's table allowlist.

This is strictly stronger (catches ``SELECT``-prefixed injections the
substring check misses) and strictly fairer (admits legitimate text that
merely contains a blocklisted word). Markdown-fence stripping and the
must-start-with-SELECT gate are preserved from the reference.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import SparkSession


class SqlValidationError(ValueError):
    pass


#: Logical-plan node names that indicate anything other than a pure query.
#: Matched against the parsed tree's node class names (word-boundary), not
#: against the raw SQL text.
_FORBIDDEN_NODE_RE = re.compile(
    r"\b("
    r"InsertInto\w*|CreateTable\w*|CreateView\w*|CreateNamespace\w*|"
    r"DropTable\w*|DropView\w*|DropNamespace\w*|AlterTable\w*|AlterView\w*|"
    r"DeleteFromTable|UpdateTable|MergeIntoTable|TruncateTable\w*|"
    r"SetCatalogAndNamespace|SetNamespace\w*|CreateFunction\w*|DropFunction\w*|"
    r"RefreshTable|RepairTable|AddArchivesCommand|AddFilesCommand|"
    r"AddJarsCommand|SetCommand|ResetCommand|ExplainCommand|"
    r"CacheTable\w*|UncacheTable\w*"
    r")\b"
)

_RELATION_RE = re.compile(r"'?UnresolvedRelation \[([^\]]+)\]")
#: Names defined inside the statement itself (CTEs, subquery aliases) are
#: legitimate relation targets without being catalog tables.
_LOCAL_ALIAS_RE = re.compile(r"'?(?:SubqueryAlias|CTERelationDef)\s+(\w+)")


def strip_markdown_fences(sql: str) -> str:
    """Reference behavior ``:288-291``: remove ```sql fences from LLM output."""
    sql = re.sub(r"```sql\n?", "", sql)
    sql = re.sub(r"```\n?", "", sql)
    return sql.strip()


@dataclass
class ValidatedSql:
    sql: str
    tables: set[str]


def validate_select(
    spark: SparkSession,
    sql: str,
    allowed_tables: set[str] | frozenset[str],
) -> ValidatedSql:
    """Parse ``sql`` and verify it is a pure SELECT over allowlisted tables.

    Raises :class:`SqlValidationError` otherwise. Returns the cleaned SQL
    (fences stripped, trailing semicolon removed — ``spark.sql`` wants a
    single statement).
    """
    if not sql or not sql.strip():
        raise SqlValidationError("empty SQL")
    cleaned = strip_markdown_fences(sql).rstrip(";").strip()

    # Reference gate :297: must start with SELECT (we also admit WITH/ CTEs
    # and parenthesized set-op queries, which are still pure queries).
    head = cleaned.lstrip("( \n\t").lower()
    if not (head.startswith("select") or head.startswith("with")):
        raise SqlValidationError("only SELECT statements are allowed")

    try:
        jparser = spark._jsparkSession.sessionState().sqlParser()
        plan = jparser.parsePlan(cleaned)
        tree = plan.treeString()
    except SqlValidationError:
        raise
    except Exception as exc:  # parse failure
        raise SqlValidationError(f"SQL does not parse: {exc}") from exc

    bad = _FORBIDDEN_NODE_RE.search(tree)
    if bad:
        raise SqlValidationError(f"non-query operation in plan: {bad.group(1)}")

    tables = set()
    for m in _RELATION_RE.finditer(tree):
        # UnresolvedRelation [db, table] or [table]
        parts = [p.strip() for p in m.group(1).split(",")]
        tables.add(parts[-1].lower())
    local_aliases = {m.group(1).lower() for m in _LOCAL_ALIAS_RE.finditer(tree)}
    unknown = tables - local_aliases - {t.lower() for t in allowed_tables}
    if unknown:
        raise SqlValidationError(f"references non-allowlisted tables: {sorted(unknown)}")
    if not tables:
        raise SqlValidationError("query references no known table")
    return ValidatedSql(sql=cleaned, tables=tables)
