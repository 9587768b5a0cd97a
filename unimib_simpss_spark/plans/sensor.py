"""Sensor-pipeline queries (reference-parity surface). Filled in with the
ingest pipeline milestone."""
