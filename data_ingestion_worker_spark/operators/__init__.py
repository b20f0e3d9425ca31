"""Operator library: each module contributes SPECS (name -> QuerySpec)."""
