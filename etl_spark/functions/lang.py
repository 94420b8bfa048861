"""Language tagging: path-extension map with content-shebang fallback.

Precedence: explicit event-supplied lang > extension map > shebang map >
null.  Pure JVM expressions (when-chain over a small static map) — stays
inside whole-stage codegen.  Dual-implemented for the oracle below.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

EXT_LANG = {
    "py": "python",
    "pyi": "python",
    "rs": "rust",
    "go": "go",
    "js": "javascript",
    "jsx": "javascript",
    "ts": "typescript",
    "tsx": "typescript",
    "java": "java",
    "c": "c",
    "h": "c",
    "cc": "cpp",
    "cpp": "cpp",
    "cxx": "cpp",
    "hpp": "cpp",
    "rb": "ruby",
    "sh": "shell",
    "bash": "shell",
    "md": "markdown",
    "txt": "text",
    "json": "json",
    "yaml": "yaml",
    "yml": "yaml",
    "toml": "toml",
    "sql": "sql",
    "scala": "scala",
    "kt": "kotlin",
    "swift": "swift",
    "php": "php",
}

SHEBANG_LANG = {
    "python": "python",
    "python3": "python",
    "bash": "shell",
    "sh": "shell",
    "zsh": "shell",
    "ruby": "ruby",
    "node": "javascript",
    "perl": "perl",
}

_SHEBANG_RX = r"^#!\S*/(?:env\s+)?([A-Za-z0-9_.-]+)"


def path_extension(path: Column) -> Column:
    """Lowercased extension, or null when the basename has no dot."""
    base = F.element_at(F.split(path, "/"), -1)
    return F.when(base.contains("."), F.lower(F.element_at(F.split(base, r"\."), -1)))


def tag_lang(path: Column, content: Column, explicit: Column | None = None) -> Column:
    # try_element_at: ANSI mode makes plain element_at throw on missing map keys
    ext = path_extension(path)
    by_ext = F.try_element_at(
        F.create_map(*[F.lit(x) for kv in EXT_LANG.items() for x in kv]), ext
    )
    interp = F.regexp_extract(content, _SHEBANG_RX, 1)
    by_shebang = F.try_element_at(
        F.create_map(*[F.lit(x) for kv in SHEBANG_LANG.items() for x in kv]),
        F.when(interp != "", interp),
    )
    derived = F.coalesce(by_ext, by_shebang)
    return F.coalesce(explicit, derived) if explicit is not None else derived


# ---------------------------------------------------------------------------
# Python twin (oracle)
# ---------------------------------------------------------------------------
_SHEBANG_RX_PY = re.compile(_SHEBANG_RX)


def tag_lang_py(path: str, content: str | None, explicit: str | None = None) -> str | None:
    if explicit is not None:
        return explicit
    base = path.rsplit("/", 1)[-1]
    if "." in base:
        ext = base.rsplit(".", 1)[-1].lower()
        if ext in EXT_LANG:
            return EXT_LANG[ext]
    if content:
        m = _SHEBANG_RX_PY.match(content)
        if m and m.group(1) in SHEBANG_LANG:
            return SHEBANG_LANG[m.group(1)]
    return None
