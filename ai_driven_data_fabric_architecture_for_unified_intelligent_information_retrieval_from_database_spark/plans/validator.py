"""Plan-level SQL validation — the sound replacement for the reference's
substring blocklist (``core/ai_query_generator.py:283-313``).

The reference rejects any SQL containing ``drop``/``create``/... *as a
substring anywhere* (``:301-302`` — which falsely rejects a column named
``updated_at``) and requires the literal substring ``employees``
(``:305-307``). Per SURVEY.md section 4.2 we instead parse the statement
with Spark's own SQL parser and validate the *logical plan*:

- every plan node in the parsed tree must be a known pure-query node
  (allowlist — an unrecognized or future command node is rejected, not
  silently admitted);
- every relation referenced must either be in the caller's table allowlist
  or be a CTE defined in an enclosing scope of that reference. Subquery
  aliases do NOT excuse a relation: ``FROM (SELECT ...) x`` never produces
  an ``UnresolvedRelation [x]``, so an alias that shares a name with a
  non-allowlisted table must not legitimize reading that table.

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


#: Logical-plan node class names that can appear in the parsed (unresolved)
#: tree of a pure query. Anything else — DDL/DML/command nodes, SHOW/DESCRIBE,
#: and node types introduced by future Spark versions — is rejected by name.
#: (Inverted from a denylist: a denylist admits what it forgot to name.)
_ALLOWED_NODES = frozenset(
    {
        # leaf relations / row generators
        "UnresolvedRelation",
        "UnresolvedInlineTable",
        "UnresolvedTableValuedFunction",
        "OneRowRelation",
        "LocalRelation",
        "Range",
        # projection / predicates / aggregation
        "Project",
        "Filter",
        "Aggregate",
        "UnresolvedHaving",
        # ordering / limiting
        "Sort",
        "GlobalLimit",
        "LocalLimit",
        "Offset",
        "Tail",
        # duplicate elimination & set operations
        "Distinct",
        "Deduplicate",
        "Union",
        "Intersect",
        "Except",
        # joins & scoping
        "Join",
        "SubqueryAlias",
        "UnresolvedSubqueryColumnAliases",
        # common table expressions (spellings across Spark versions)
        "CTE",
        "UnresolvedWith",
        "CTERelationDef",
        "CTERelationRef",
        # windows / generators / reshaping
        "Window",
        "WithWindowDefinition",
        "Generate",
        "Pivot",
        "Unpivot",
        # sampling / hints / distribution (pure — affect physical layout only)
        "Sample",
        "UnresolvedHint",
        "Repartition",
        "RepartitionByExpression",
    }
)

_BRACKET_RE = re.compile(r"\[([^\]]*)\]")


def strip_markdown_fences(sql: str) -> str:
    """Reference behavior ``:288-291``: remove ```sql fences from LLM output."""
    sql = re.sub(r"```sql\n?", "", sql)
    sql = re.sub(r"```\n?", "", sql)
    return sql.strip()


@dataclass
class ValidatedSql:
    sql: str
    tables: set[str]


@dataclass(frozen=True)
class _TreeNode:
    index: int  #: line number within the treeString
    indent: int  #: column where the node name starts — children indent deeper
    name: str  #: plan node class name (leading ' stripped)
    rest: str  #: full node text from the name onward


def _parse_tree_nodes(tree: str) -> list[_TreeNode]:
    """One :class:`_TreeNode` per treeString line.

    ``treeString`` prints exactly one plan node per line, prefixed by
    tree-drawing characters (``+-``, ``:-``, ``:``, spaces) whose width
    strictly increases from parent to child — so subtree membership can be
    recovered by indent comparison without walking JVM objects.
    """
    nodes: list[_TreeNode] = []
    for i, line in enumerate(tree.splitlines()):
        if not line.strip():
            continue
        indent = re.match(r"^[\s:+\-]*", line).end()
        rest = line[indent:]
        if rest.startswith("'"):
            rest = rest[1:]
        m = re.match(r"[A-Za-z_$][\w$]*", rest)
        if not m:  # defensive: a line with no node-name-shaped token
            raise SqlValidationError(f"unrecognized plan line: {line.strip()!r}")
        nodes.append(_TreeNode(index=i, indent=indent, name=m.group(0), rest=rest))
    return nodes


def _cte_scopes(nodes: list[_TreeNode]) -> list[tuple[int, int, set[str]]]:
    """``(start, end, names)`` spans in which each CTE definition is in scope.

    A ``CTE [a, b]`` node's names are visible exactly within its subtree
    (the following lines with greater indent). Names are deliberately NOT
    collected globally: a CTE defined inside one subquery must not excuse a
    same-named real-table read elsewhere in the statement.
    """
    scopes = []
    for pos, node in enumerate(nodes):
        names: set[str] = set()
        if node.name in ("CTE", "UnresolvedWith"):
            m = _BRACKET_RE.search(node.rest)
            if m:
                names = {p.strip().lower() for p in m.group(1).split(",") if p.strip()}
        elif node.name == "CTERelationDef":
            m = re.match(r"CTERelationDef\s+(\w+)", node.rest)
            if m:
                names = {m.group(1).lower()}
        if not names:
            continue
        end = node.index
        for later in nodes[pos + 1 :]:
            if later.indent <= node.indent:
                break
            end = later.index
        scopes.append((node.index, end, names))
    return scopes


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

    nodes = _parse_tree_nodes(tree)
    for node in nodes:
        if node.name not in _ALLOWED_NODES:
            raise SqlValidationError(f"non-query operation in plan: {node.name}")

    scopes = _cte_scopes(nodes)
    tables: set[str] = set()
    unknown: set[str] = set()
    allowed_lower = {t.lower() for t in allowed_tables}
    for node in nodes:
        if node.name != "UnresolvedRelation":
            continue
        m = _BRACKET_RE.search(node.rest)
        if not m:
            continue
        # UnresolvedRelation prints its multipart name as [part, part, ...]:
        # [table], [db, table], or a file-source relation like
        # [parquet, /some/path]. Matching only the last segment would let
        # `db.employees` / `parquet.`/x,employees`` impersonate an
        # allowlisted `employees` while reading a different catalog or
        # file — so a multipart name must be allowlisted as its FULL
        # dotted form, and a single-part name must be a plain identifier
        # (CTE names always are, so scope resolution is unaffected).
        parts = [p.strip() for p in m.group(1).split(",")]
        full = ".".join(p.lower() for p in parts)
        if full in allowed_lower:
            tables.add(full)
            continue
        if len(parts) > 1:
            raise SqlValidationError(
                f"multipart relation name not allowlisted: {full!r}"
            )
        name = parts[0].lower()
        if not re.fullmatch(r"[a-z_][a-z0-9_]*", name):
            raise SqlValidationError(
                f"relation name is not a plain identifier: {name!r}"
            )
        in_cte_scope = any(
            start <= node.index <= end and name in names for start, end, names in scopes
        )
        if in_cte_scope:
            continue
        tables.add(name)
        if name not in allowed_lower:
            unknown.add(name)
    if unknown:
        raise SqlValidationError(f"references non-allowlisted tables: {sorted(unknown)}")
    if not tables and not scopes:
        raise SqlValidationError("query references no known table")
    return ValidatedSql(sql=cleaned, tables=tables)
