"""Ingestion sources: config scans and REST connectors (mockable, rate-limit
aware), producing DataFrames with the reference data-model schemas."""
