"""Sinks: parquet (native), text (native), TFRecord (pure-Python writer)."""
