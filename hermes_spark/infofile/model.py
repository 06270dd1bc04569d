"""Diff record model.

``ModelDifference`` mirrors the reference's
``infoFileComparison/.../ModelDifference.scala:29`` —
``{path: "metadata.country", was, is}`` with a JSONPath-like path.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any


@dataclass(frozen=True)
class ModelDifference:
    path: str
    was: Any
    is_: Any

    def to_dict(self) -> dict[str, Any]:
        return {"path": self.path, "was": self.was, "is": self.is_}


def differences_as_json(diffs: list[ModelDifference]) -> str:
    """Pretty-JSON list of differences (reference
    ``ModelDifference.scala:36-44`` / ``SerializationUtils.asJsonPretty``)."""
    return json.dumps([d.to_dict() for d in diffs], indent=2)
