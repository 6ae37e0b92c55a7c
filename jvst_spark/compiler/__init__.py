"""Lowering stages: ConstraintNode DAG -> executable form.

Two backends:
- pyeval: DAG -> Python closures, for dynamic (schemaless) JSON
  documents. Runs inside Arrow-batched pandas UDFs; the per-document
  analogue of jvst's VM run (src/validate_vm.c:1136-1592).
- typed: DAG x Spark DataType -> pyspark.sql.Column expressions, for
  statically-typed columns. The scale path: pure JVM-side, Catalyst-
  optimized, whole-stage-codegen'd; jvst's entire interpreter dissolves
  into vectorized expressions.
"""
