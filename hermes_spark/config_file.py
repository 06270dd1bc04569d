"""Config-file loading for the dataset comparison.

Reference parity: the reference loads comparator defaults through
Typesafe config (``datasetComparison/.../config/TypesafeConfig.scala:21-31``
reading ``dataset-comparison.{errColumn,actualPrefix,expectedPrefix,
allowDuplicates}`` with ``reference.conf`` defaults, overridable via
``-Dconfig.file=...``; ``ManualConfig.scala`` is the programmatic
equivalent).  This module gives a user porting an existing
``reference.conf``/``application.conf`` a file path again:

* :func:`parse_hocon_lite` understands the HOCON subset those files use —
  nested ``name { ... }`` blocks, ``key = value`` / ``key: value``,
  dotted keys, ``#`` and ``//`` comments, quoted and bare scalars — and
  plain JSON documents (HOCON is a JSON superset);
* :func:`load_comparison_config` layers library defaults <- file values
  <- explicit overrides (the CLI), honoring the
  ``HERMES_SPARK_CONFIG`` environment variable (the Python analogue of
  ``-Dconfig.file``) when no path is given, and validates the result
  (forbidden column characters, known mode) exactly like
  ``ComparisonConfig.validate``.

Scale note: config loading is driver-side and happens once per job —
no Spark dataflow is involved.
"""

from __future__ import annotations

import json
import os
import re
from typing import Mapping, Optional

from .config import ComparisonConfig, DEFAULT_CONFIG

#: environment variable naming a default config file (analogue of the
#: JVM's ``-Dconfig.file=...`` override the reference documents)
CONFIG_ENV_VAR = "HERMES_SPARK_CONFIG"

_CONFIG_PREFIX = "dataset-comparison."

#: config key (reference camelCase spelling) -> ComparisonConfig field
_KEY_MAP = {
    "errColumn": "error_column_name",
    "actualPrefix": "actual_prefix",
    "expectedPrefix": "expected_prefix",
    "allowDuplicates": "allow_duplicates",
    # extension keys (same block, camelCase to match the reference style)
    "mode": "mode",
    "exceptAll": "except_all",
    "hashModeBroadcastRows": "hash_mode_broadcast_rows",
    "observeMetrics": "observe_metrics",
    "autoHashRowBytes": "auto_hash_row_bytes",
}
#: snake_case spellings are accepted too (Python-side config files)
_KEY_MAP.update({
    "error_column_name": "error_column_name",
    "actual_prefix": "actual_prefix",
    "expected_prefix": "expected_prefix",
    "allow_duplicates": "allow_duplicates",
    "except_all": "except_all",
    "hash_mode_broadcast_rows": "hash_mode_broadcast_rows",
    "observe_metrics": "observe_metrics",
    "auto_hash_row_bytes": "auto_hash_row_bytes",
})

_BOOL_FIELDS = {"allow_duplicates", "except_all", "observe_metrics"}
_INT_FIELDS = {"hash_mode_broadcast_rows", "auto_hash_row_bytes"}

_LINE_RE = re.compile(
    r"""^\s*
        (?P<key>[A-Za-z0-9_.\-]+|"[^"]+")   # key or quoted key
        \s*(?:[=:]\s*)?                      # separator (optional before {)
        (?P<rest>.*)$""",
    re.VERBOSE,
)


class ConfigFileError(ValueError):
    """Raised for unreadable or malformed config files."""


def _strip_comment(line: str) -> str:
    """Remove a ``#`` / ``//`` comment that is not inside a quoted string."""
    out = []
    in_quote = False
    i = 0
    while i < len(line):
        ch = line[i]
        if ch == '"':
            in_quote = not in_quote
        elif not in_quote:
            if ch == "#":
                break
            if ch == "/" and line[i : i + 2] == "//":
                break
        out.append(ch)
        i += 1
    return "".join(out)


def _parse_scalar(raw: str):
    raw = raw.strip()
    if raw.startswith('"') and raw.endswith('"') and len(raw) >= 2:
        return raw[1:-1]
    low = raw.lower()
    if low in ("true", "yes", "on"):
        return True
    if low in ("false", "no", "off"):
        return False
    if low in ("null", "none"):
        return None
    try:
        return int(raw)
    except ValueError:
        pass
    try:
        return float(raw)
    except ValueError:
        pass
    return raw


def parse_hocon_lite(text: str) -> dict:
    """Parse a HOCON-subset / JSON document into a flat dotted-key dict.

    Supports exactly what reference-style ``.conf`` files use; raises
    :class:`ConfigFileError` on structures outside that subset (HOCON
    includes, substitutions, multi-line arrays).
    """
    stripped = text.lstrip()
    if stripped.startswith("{"):
        try:
            doc = json.loads(text)
        except json.JSONDecodeError:
            doc = None
        if isinstance(doc, dict):
            flat: dict = {}

            def walk(prefix: str, node) -> None:
                for k, v in node.items():
                    key = f"{prefix}{k}"
                    if isinstance(v, dict):
                        walk(key + ".", v)
                    else:
                        flat[key] = v

            walk("", doc)
            return flat

    # normalize: strip comments, then put every brace (outside quotes) on
    # its own logical line so `a { b = 1 }` parses like a 3-line block
    lines: list[str] = []
    for raw_line in text.splitlines():
        stripped_line = _strip_comment(raw_line)
        buf = ""
        in_q = False
        for ch in stripped_line:
            if ch == '"':
                in_q = not in_q
                buf += ch
            elif ch == "{" and not in_q:
                lines.append(buf + " {")
                buf = ""
            elif ch == "}" and not in_q:
                lines.append(buf)
                lines.append("}")
                buf = ""
            else:
                buf += ch
        lines.append(buf)

    flat = {}
    stack: list[str] = []
    for lineno, line in enumerate(lines, start=1):
        line = line.strip()
        if not line:
            continue
        if line == "}":
            if not stack:
                raise ConfigFileError(f"token {lineno}: unmatched '}}'")
            stack.pop()
            continue
        if "${" in line:
            raise ConfigFileError(
                f"token {lineno}: HOCON substitutions are not supported"
            )
        if line.startswith("include"):
            raise ConfigFileError(
                f"token {lineno}: HOCON includes are not supported"
            )
        m = _LINE_RE.match(line)
        if not m:
            raise ConfigFileError(f"token {lineno}: cannot parse {line!r}")
        key = m.group("key").strip('"')
        rest = m.group("rest").strip()
        if rest == "{":
            stack.append(key)
            continue
        if not rest:
            raise ConfigFileError(f"token {lineno}: missing value for {key!r}")
        prefix = ".".join(stack)
        flat[f"{prefix}.{key}" if prefix else key] = _parse_scalar(rest)
    if stack:
        raise ConfigFileError(f"unclosed block(s): {' > '.join(stack)}")
    return flat


def _coerce(field: str, value):
    if field in _BOOL_FIELDS:
        if isinstance(value, bool):
            return value
        if isinstance(value, str):
            low = value.lower()
            if low in ("true", "yes", "on", "1"):
                return True
            if low in ("false", "no", "off", "0"):
                return False
        raise ConfigFileError(f"{field}: expected a boolean, got {value!r}")
    if field in _INT_FIELDS:
        if isinstance(value, bool) or not isinstance(value, (int, float, str)):
            raise ConfigFileError(f"{field}: expected an integer, got {value!r}")
        try:
            return int(value)
        except ValueError:
            raise ConfigFileError(f"{field}: expected an integer, got {value!r}")
    if not isinstance(value, str):
        raise ConfigFileError(f"{field}: expected a string, got {value!r}")
    return value


def config_fields_from_mapping(flat: Mapping[str, object]) -> dict:
    """Extract ComparisonConfig field overrides from a flat dotted-key
    mapping.  Only the ``dataset-comparison.`` block is consulted (other
    sections of an application.conf are ignored, matching Typesafe
    semantics); unknown keys INSIDE the block raise, catching typos."""
    fields: dict = {}
    for key, value in flat.items():
        if not key.startswith(_CONFIG_PREFIX):
            continue
        short = key[len(_CONFIG_PREFIX):]
        if short not in _KEY_MAP:
            raise ConfigFileError(
                f"unknown dataset-comparison config key: {short!r} "
                f"(known: {sorted(set(_KEY_MAP))})"
            )
        field = _KEY_MAP[short]
        fields[field] = _coerce(field, value)
    return fields


def load_comparison_config(
    path: Optional[str] = None,
    overrides: Optional[Mapping[str, object]] = None,
    base: ComparisonConfig = DEFAULT_CONFIG,
) -> ComparisonConfig:
    """Layered config resolution: ``base`` (reference.conf defaults) <-
    config file <- ``overrides`` (CLI flags); validated on return.

    ``path=None`` consults the :data:`CONFIG_ENV_VAR` environment
    variable; when neither names a file, the base defaults pass through
    unchanged (same behavior as the reference running without
    ``-Dconfig.file``).
    """
    resolved = path or os.environ.get(CONFIG_ENV_VAR)
    fields: dict = {}
    if resolved:
        try:
            with open(resolved, "r", encoding="utf-8") as fh:
                text = fh.read()
        except OSError as exc:
            raise ConfigFileError(f"cannot read config file {resolved!r}: {exc}")
        fields.update(config_fields_from_mapping(parse_hocon_lite(text)))
    if overrides:
        for k, v in overrides.items():
            if v is None:
                continue
            if k not in ComparisonConfig.__dataclass_fields__:
                raise ConfigFileError(f"unknown override field: {k!r}")
            fields[k] = _coerce(k, v) if isinstance(v, str) else v
    merged = {
        name: fields.get(name, getattr(base, name))
        for name in ComparisonConfig.__dataclass_fields__
    }
    return ComparisonConfig(**merged).validate()
