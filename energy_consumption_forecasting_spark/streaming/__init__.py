"""Structured Streaming extensions (SURVEY §2.5 note, §7 phase 5).

The reference is batch-only (six-month EIA files re-downloaded
wholesale, ETL.py:56-77); these operators are the streaming-native form
of its hourly→daily rollup, plus stateful custom aggregation.
"""
