"""Test doubles for running the engine without external services."""
