"""Layered JSON recovery from model responses (J1).

Reproduces batch_pdf_processor.py:2297-2416: structured dict passthrough,
``message.parsed``, tool-call arguments, content-list flattening, then text
fallbacks — direct parse, three fenced-code patterns, fence-anchored brace
matching, and a whole-string brace scan. Needed only on the (stubbed) LLM
path but kept byte-compatible for shape parity.
"""

from __future__ import annotations

import json
import re
from typing import Any, Dict

_REQUIRED_TOP_LEVEL = {"schema_version", "doc", "passages", "entities", "data"}

_CODE_BLOCK_PATTERNS = [
    re.compile(r"```json\s*\n(.*?)\n```", re.DOTALL),
    re.compile(r"```\s*\n(\{.*?\})\s*\n```", re.DOTALL),
    re.compile(r"```json\s*(.*?)```", re.DOTALL),
]
_FENCE_OPEN_RE = re.compile(r"```(?:json)?\s*(\{)", re.DOTALL)


def extract_json(response: Any) -> Dict:
    """Never raises; returns {} when nothing parseable is found."""
    if isinstance(response, dict):
        if _REQUIRED_TOP_LEVEL.issubset(response.keys()):
            return response
        choices = response.get("choices") or []
        if choices:
            message = choices[0].get("message", {})
            if isinstance(message, dict):
                parsed = message.get("parsed")
                if isinstance(parsed, dict):
                    return parsed
                if isinstance(parsed, list):
                    for item in parsed:
                        if isinstance(item, dict):
                            return item
                for call in message.get("tool_calls") or []:
                    fn = call.get("function", {}) if isinstance(call, dict) else {}
                    args = fn.get("arguments")
                    if isinstance(args, dict):
                        return args
                    if isinstance(args, str):
                        try:
                            return json.loads(args)
                        except json.JSONDecodeError:
                            continue
                content = message.get("content")
                if isinstance(content, list):
                    content = "\n".join(
                        p.get("text", "") for p in content
                        if isinstance(p, dict) and p.get("type") == "text").strip()
                if isinstance(content, str) and content.strip():
                    return extract_json(content.strip())
        try:
            return extract_json(json.dumps(response, ensure_ascii=False))
        except TypeError:
            return {}

    if isinstance(response, (list, tuple)):
        for item in response:
            result = extract_json(item)
            if result:
                return result
        return {}

    text = response if isinstance(response, str) else str(response)

    # Deviation from the reference: every textual parse below is accepted
    # ONLY if it yields an object. The reference returns whatever json.loads
    # produces ("42" → 42) despite its Dict contract and crashes downstream;
    # we enforce the contract here.
    try:
        parsed = json.loads(text)
        if isinstance(parsed, dict):
            return parsed
    except json.JSONDecodeError:
        pass

    for rx in _CODE_BLOCK_PATTERNS:
        m = rx.search(text)
        if m:
            try:
                parsed = json.loads(m.group(1).strip())
                if isinstance(parsed, dict):
                    return parsed
            except json.JSONDecodeError:
                continue

    m = _FENCE_OPEN_RE.search(text)
    if m:
        depth = 0
        start = m.start(1)
        for i in range(start, len(text)):
            if text[i] == "{":
                depth += 1
            elif text[i] == "}":
                depth -= 1
                if depth == 0:
                    try:
                        return json.loads(text[start:i + 1])
                    except json.JSONDecodeError:
                        break

    depth = 0
    start = -1
    for i, ch in enumerate(text):
        if ch == "{":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "}":
            if depth == 0:
                continue  # stray '}' before any '{' must not poison the scan
            depth -= 1
            if depth == 0 and start != -1:
                try:
                    return json.loads(text[start:i + 1])
                except json.JSONDecodeError:
                    start = -1
                    depth = 0
    return {}
