"""WhereCondition-complete predicate compiler (VERDICT r12 task 2).

Pins the spec->Column compilers in operators/constraints.py against the
reference's operator enums: the full Cypher ComparisonOperator set
(models/cipher_ast.py:26-51), the and_operator chain semantics (:585-595),
and the G15 SearchOverrideFilter grouping (chat_gpt_completion.py:5699-5744).
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from memory_opensource_spark.operators.constraints import (
    SearchFilter,
    WhereCondition,
    compile_search_filters,
    compile_when,
    compile_where,
)


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame([
        Row(id=1, name="Ada Lovelace", role="engineer", org="o1", score=10),
        Row(id=2, name="Grace Hopper", role="admiral", org="o2", score=20),
        Row(id=3, name="Alan Turing", role="engineer", org=None, score=30),
        Row(id=4, name="Edsger Dijkstra", role=None, org="o1", score=40),
        Row(id=5, name=None, role="manager", org="o3", score=50),
    ])


def _ids(df, pred):
    return sorted(r.id for r in df.filter(pred).collect())


class TestOpsKernel:
    """The four WhereCondition-completing _OPS additions via compile_when."""

    def test_not_in_three_valued(self, people):
        # org NULL -> NULL NOT IN (...) -> NULL -> dropped (SQL/Cypher 3VL):
        # row 3 (org=None) must NOT appear even though 'None not in list'
        # would be True in Python semantics
        out = _ids(people, compile_when({"org": {"not_in": ["o1"]}}))
        assert out == [2, 5]

    def test_is_null_and_is_not_null(self, people):
        assert _ids(people, compile_when({"role": {"is_null": True}})) == [4]
        assert _ids(people, compile_when({"role": {"is_not_null": True}})) == [1, 2, 3, 5]

    def test_regex_is_full_match(self, people):
        # Cypher =~ is java Pattern.matches: 'Ada' alone matches no full name
        assert _ids(people, compile_when({"name": {"regex": "Ada"}})) == []
        assert _ids(people, compile_when({"name": {"regex": "Ada .*"}})) == [1]
        # alternation must anchor BOTH branches (non-capturing group wrap):
        # 'Ada|.*Hopper' as a naive '^Ada|.*Hopper$' would match 'Ada Lovelace'
        assert _ids(people, compile_when({"name": {"regex": "Ada|.*Hopper"}})) == [2]
        # NULL name -> NULL rlike -> dropped, never an error
        assert 5 not in _ids(people, compile_when({"name": {"regex": ".*"}}))


class TestCompileWhere:
    def test_every_cypher_operator_compiles(self, people):
        conds = [
            WhereCondition("name", "=", "Ada Lovelace"),
            WhereCondition("name", "<>", "x", and_operator=False),
            WhereCondition("score", ">", 1),
            WhereCondition("score", ">=", 10),
            WhereCondition("score", "<", 100),
            WhereCondition("score", "<=", 50),
            WhereCondition("name", "CONTAINS", "a"),
            WhereCondition("name", "STARTS WITH", "A"),
            WhereCondition("name", "ENDS WITH", "e"),
            WhereCondition("role", "IN", ["engineer", "admiral"]),
            WhereCondition("role", "NOT IN", ["manager"]),
            WhereCondition("org", "IS NULL"),
            WhereCondition("org", "IS NOT NULL", and_operator=False),
            WhereCondition("name", "=~", "[A-Za-z ]+"),
        ]
        pred = compile_where(conds)
        assert pred is not None
        people.filter(pred).collect()  # compiles and runs

    def test_unknown_operator_raises(self):
        with pytest.raises(ValueError, match="unknown Cypher operator"):
            compile_where([WhereCondition("name", "LIKE", "%a%")])

    def test_cypher_precedence_and_binds_tighter(self, people):
        # c1 AND c2 OR c3  ==  (c1 AND c2) OR c3  — NOT c1 AND (c2 OR c3)
        conds = [
            WhereCondition("role", "=", "engineer"),            # c1
            WhereCondition("score", ">", 25),                   # AND c2
            WhereCondition("name", "CONTAINS", "Hopper",        # OR c3
                           and_operator=False),
        ]
        # (engineer AND >25) -> {3}; OR Hopper -> {2,3}.  The wrong grouping
        # engineer AND (>25 OR Hopper) would give {3} plus nothing: {3} ∪ ∅.
        assert _ids(people, compile_where(conds)) == [2, 3]

    def test_and_operator_none_skips_condition(self, people):
        conds = [
            WhereCondition("role", "=", "engineer"),
            WhereCondition("name", "=", "nobody", and_operator=None),  # skipped
        ]
        assert _ids(people, compile_where(conds)) == [1, 3]

    def test_first_condition_connective_ignored(self, people):
        # cipher_ast.py: the first condition never emits a connective — a
        # leading and_operator=False must not create an empty OR-group
        conds = [WhereCondition("role", "=", "engineer", and_operator=False)]
        assert _ids(people, compile_where(conds)) == [1, 3]

    def test_empty_chain_returns_none(self):
        assert compile_where([]) is None

    def test_null_three_valued_on_both_polarities(self, people):
        # org IS NULL picks the legacy row; org NOT IN drops it; their OR
        # re-admits it — classic Cypher NULL algebra
        conds = [
            WhereCondition("org", "NOT IN", ["o2", "o3"]),
            WhereCondition("org", "IS NULL", and_operator=False),
        ]
        assert _ids(people, compile_where(conds)) == [1, 3, 4]


class TestSearchFilters:
    def test_same_property_ors_distinct_properties_and(self, people):
        pred = compile_search_filters([
            SearchFilter("Person", "name", "CONTAINS", "Ada"),
            SearchFilter("Person", "name", "CONTAINS", "Grace"),  # OR
            SearchFilter("Person", "role", "IN", ["engineer", "admiral"]),  # AND
        ], label="Person")
        assert _ids(people, pred) == [1, 2]

    def test_other_label_filters_ignored(self, people):
        pred = compile_search_filters([
            SearchFilter("Person", "role", "EQUALS", "engineer"),
            SearchFilter("Company", "name", "CONTAINS", "zzz"),  # not Person
        ], label="Person")
        assert _ids(people, pred) == [1, 3]

    def test_empty_value_filter_dropped(self, people):
        pred = compile_search_filters([
            SearchFilter("Person", "role", "EQUALS", "engineer"),
            SearchFilter("Person", "name", "CONTAINS", ""),  # dropped (:5712)
        ], label="Person")
        assert _ids(people, pred) == [1, 3]

    def test_valueless_null_checks_survive_the_value_drop(self, people):
        pred = compile_search_filters(
            [SearchFilter("Person", "org", "IS NULL")], label="Person")
        assert _ids(people, pred) == [3]

    def test_public_enum_spellings_normalize(self, people):
        # the public G15 enum spells STARTS_WITH/EQUALS; the executor's
        # schema uses the Cypher tokens — both must compile identically
        a = compile_search_filters(
            [SearchFilter("P", "name", "STARTS_WITH", "A")], label="P")
        b = compile_search_filters(
            [SearchFilter("P", "name", "STARTS WITH", "A")], label="P")
        assert _ids(people, a) == _ids(people, b) == [1, 3]

    def test_nothing_matching_label_returns_none(self, people):
        assert compile_search_filters(
            [SearchFilter("Company", "name", "CONTAINS", "x")], label="Person") is None

    def test_unknown_operator_raises(self):
        with pytest.raises(ValueError, match="unknown G15 filter operator"):
            compile_search_filters(
                [SearchFilter("P", "name", "FUZZY", "x")], label="P")


class TestSearchOverride:
    """operators/graph.search_override: the one-call G15 spec surface."""

    @pytest.fixture(scope="class")
    def g(self, spark):
        nodes = spark.createDataFrame([
            ("p1", "Person", "Ada", "active"),
            ("p2", "Person", "Grace", "retired"),
            ("c1", "Company", "Initech", "active"),
            ("c2", "Company", "Acme", "active"),
        ], "node_id string, label string, prop_name string, "
           "prop_status string")
        edges = spark.createDataFrame([
            ("p1", "c1", "WORKS_FOR"), ("p2", "c2", "WORKS_FOR"),
            ("p1", "c2", "FOUNDED"),
        ], "src string, dst string, rel_type string")
        return nodes, edges

    def test_directed_with_filters_and_projection(self, g):
        from memory_opensource_spark.operators.constraints import SearchFilter
        from memory_opensource_spark.operators.graph import search_override

        nodes, edges = g
        out = search_override(
            nodes, edges, source_label="Person",
            relationship_type="WORKS_FOR", target_label="Company",
            direction="->",
            filters=[SearchFilter("Person", "prop_status", "EQUALS",
                                  "active"),
                     SearchFilter("Company", "prop_name", "CONTAINS", "tech")],
            return_properties=["prop_name"])
        rows = out.collect()
        assert [(r.m_id, r.n_id) for r in rows] == [("p1", "c1")]
        assert set(out.columns) == {"m_id", "m_label", "rel_type", "n_id",
                                    "n_label", "m_prop_name", "n_prop_name"}
        assert rows[0].m_prop_name == "Ada" and rows[0].n_prop_name == "Initech"

    def test_incoming_direction_token(self, g):
        from memory_opensource_spark.operators.graph import search_override

        nodes, edges = g
        out = search_override(
            nodes, edges, source_label="Company",
            relationship_type="WORKS_FOR", target_label="Person",
            direction="<-")
        assert sorted((r.m_id, r.n_id) for r in out.collect()) == [
            ("c1", "p1"), ("c2", "p2")]

    def test_bidirectional_token(self, g):
        from memory_opensource_spark.operators.graph import search_override

        nodes, edges = g
        out = search_override(
            nodes, edges, source_label="Person",
            relationship_type="FOUNDED", target_label="Company",
            direction="-")
        assert [(r.m_id, r.n_id) for r in out.collect()] == [("p1", "c2")]

    def test_bad_direction_raises(self, g):
        from memory_opensource_spark.operators.graph import search_override

        nodes, edges = g
        with pytest.raises(ValueError, match="direction"):
            search_override(nodes, edges, source_label="Person",
                            relationship_type="WORKS_FOR",
                            target_label="Company", direction="=>")

    def test_acl_applies_to_both_endpoints(self, g):
        from memory_opensource_spark.operators.graph import search_override

        nodes, edges = g
        out = search_override(
            nodes, edges, source_label="Person",
            relationship_type="WORKS_FOR", target_label="Company",
            direction="->", acl=F.col("prop_status") == "active")
        # p2 is retired: its edge drops even though c2 is active
        assert [(r.m_id, r.n_id) for r in out.collect()] == [("p1", "c1")]
