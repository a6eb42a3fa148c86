"""Standalone validation tools (the reference's extra [[bin]] targets)."""
