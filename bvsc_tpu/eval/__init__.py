"""Evaluation: objective metrics + MUSHRA listening-test statistics."""
