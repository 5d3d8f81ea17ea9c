"""Physical-plan inspection (SURVEY.md §4): verify Catalyst did its job."""

from .inspect import formatted_plan, plan_has  # noqa: F401
