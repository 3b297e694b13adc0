"""Text-analysis operators (driver-mandated extension, SURVEY.md §2 Part C)."""

from __future__ import annotations
