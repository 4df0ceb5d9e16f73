"""R2 reasoning twin (SURVEY.md §2.11): rdfs:subClassOf transitive closure
+ rdfs9 type inference — the subsumption triples the reference's optional
``sync_reasoner()`` adds (/root/reference/process/ontology_updater.py:69-74)."""

from uckg_spark.operators.reasoning import infer_types, transitive_closure


def _pairs(df):
    return sorted(tuple(r) for r in df.collect())


class TestTransitiveClosure:
    def test_chain(self, spark):
        edges = spark.createDataFrame(
            [("D", "C"), ("C", "B"), ("B", "A")], ["child", "parent"])
        got = _pairs(transitive_closure(edges))
        assert got == sorted([
            ("B", "A"), ("C", "A"), ("C", "B"),
            ("D", "A"), ("D", "B"), ("D", "C"),
        ])

    def test_dag_with_diamond(self, spark):
        # D ⊂ {B, C} ⊂ A — the diamond must not duplicate (D, A)
        edges = spark.createDataFrame(
            [("D", "B"), ("D", "C"), ("B", "A"), ("C", "A")],
            ["child", "parent"])
        got = _pairs(transitive_closure(edges))
        assert got == sorted([
            ("B", "A"), ("C", "A"),
            ("D", "A"), ("D", "B"), ("D", "C"),
        ])

    def test_cycle_converges(self, spark):
        # owl:equivalentClass modeled as a 2-cycle: closure terminates and
        # each member reaches the other (self-loops dropped)
        edges = spark.createDataFrame(
            [("A", "B"), ("B", "A"), ("C", "A")], ["child", "parent"])
        got = _pairs(transitive_closure(edges))
        assert got == sorted([("A", "B"), ("B", "A"), ("C", "A"), ("C", "B")])


class TestInferTypes:
    def test_rdfs9(self, spark):
        tc = transitive_closure(spark.createDataFrame(
            [("B", "A"), ("C", "B")], ["child", "parent"]))
        types = spark.createDataFrame(
            [("x", "C"), ("y", "A")], ["instance", "cls"])
        got = _pairs(infer_types(types, tc))
        assert got == sorted([("x", "A"), ("x", "B"), ("x", "C"), ("y", "A")])
