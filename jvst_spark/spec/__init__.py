"""Spec language: ConstraintNode taxonomy + compiler stages.

translate -> simplify -> canonify, the driver-side analogue of jvst's
cnode pipeline (src/validate_constraints.c). Pure Python, unit-testable
against golden trees exactly like the reference's test_constraints.c.
"""
