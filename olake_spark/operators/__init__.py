"""Maintenance + pipeline operators over icelite tables and plain DataFrames."""
