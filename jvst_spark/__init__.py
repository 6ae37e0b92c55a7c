"""jvst_spark — a PySpark-native schema + constraint validation engine.

A from-scratch re-expression of the capabilities of katef/jvst (a JSON
Schema draft-6 validator *compiler*, C, /root/reference) as an idiomatic
PySpark engine:

    spec (JSON-Schema-style dict)
      -> translate  -> ConstraintNode DAG      (jvst: ast -> cnode,
                                                src/validate_constraints.c:1263-1718)
      -> simplify   -> reduced DAG             (jvst: jvst_cnode_simplify,
                                                src/validate_constraints.c:4726-4857)
      -> canonify   -> deterministic DAG       (jvst: jvst_cnode_canonify,
                                                src/validate_constraints.c:5877-5885)
      -> lower      -> pyspark Column predicates / vectorized stages
                                               (replaces jvst's IR -> VM bytecode;
                                                Catalyst+Tungsten are our "VM")

plus table-level checks jvst's single-document scope cannot express
(uniqueness, referential integrity, distribution drift) and
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing).
"""

from jvst_spark.spec.translate import translate
from jvst_spark.spec.simplify import simplify
from jvst_spark.spec.canonify import canonify
from jvst_spark.compiler.pyeval import compile_python
from jvst_spark.compiler.plan import ValidationPlan, compile_schema

__all__ = [
    "translate",
    "simplify",
    "canonify",
    "compile_python",
    "compile_schema",
    "ValidationPlan",
]

__version__ = "0.1.0"
