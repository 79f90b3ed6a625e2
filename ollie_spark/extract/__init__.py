"""Extraction core: expansion rules, match -> triple building, templates,
context detection, features, and confidence."""
