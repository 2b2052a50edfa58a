from .evaluate import evaluate_field, FieldEval

__all__ = ["evaluate_field", "FieldEval"]
