"""mxj-compatible XML ⇄ map handling for the BFL ``xml()`` helper and
XML redaction.

Parity target: the reference uses ``github.com/clbanning/mxj/v2``
(``/root/reference/server/lib/eval.go:379-439``):

* ``mxj.NewMapXml`` — XML → ``map[string]interface{}`` with attributes
  prefixed ``-``, element text under ``#text`` when the element has
  attributes, repeated sibling tags collected into lists.
* ``ValuesForPath("bookstore.book[1].title")`` — dotted path with 0-based
  ``[n]`` subscripts; attribute-bearing leaves resolve via ``#text``
  (``eval.go:399-403``).
* ``mxj.Map.Xml()`` — re-serializes with keys in *alphabetical* order
  (pinned by the redact-XML goldens, ``eval_test.go:234-236``), attributes
  restored, original XML declaration line re-prepended when the source
  started with ``<?`` (``eval.go:429-433``).
"""

from __future__ import annotations

import base64
import re
import xml.etree.ElementTree as ET
from typing import Any, List, Optional

from . import pyeval  # only for try_base64 at redact time (lazy import ok)


def xml_to_map(xml_text: str) -> Optional[dict]:
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        return None
    return {root.tag: _elem_to_value(root)}


def _elem_to_value(elem: ET.Element) -> Any:
    children = list(elem)
    attrs = {f"-{k}": v for k, v in elem.attrib.items()}
    text = (elem.text or "").strip()
    if not children and not attrs:
        return text
    if not children:
        out = dict(attrs)
        if text:
            out["#text"] = text
        return out
    out: dict = dict(attrs)
    if text:
        out["#text"] = text
    for child in children:
        v = _elem_to_value(child)
        if child.tag in out:
            prev = out[child.tag]
            if isinstance(prev, list):
                prev.append(v)
            else:
                out[child.tag] = [prev, v]
        else:
            out[child.tag] = v
    return out


_SUBSCRIPT = re.compile(r"^(.*?)\[(\d+)\]$")


def _values_for_path(obj: Any, parts: List[str]) -> List[Any]:
    """mxj ``ValuesForPath`` over a dotted path with optional ``[n]``."""
    results = [obj]
    for part in parts:
        if not part:
            continue
        idx = None
        m = _SUBSCRIPT.match(part)
        if m:
            part, idx = m.group(1), int(m.group(2))
        nxt: List[Any] = []
        for r in results:
            if isinstance(r, dict) and part in r:
                v = r[part]
                if idx is not None:
                    if isinstance(v, list) and 0 <= idx < len(v):
                        nxt.append(v[idx])
                else:
                    nxt.append(v)
            elif isinstance(r, list):
                for item in r:
                    if isinstance(item, dict) and part in item:
                        nxt.append(item[part])
        results = nxt
    return results


def xml_get(xml_text: str, segments: List[Any]) -> Any:
    """The ``xml()`` query helper: parse + path lookup; ``#text``
    extraction for attribute-bearing elements (``eval.go:379-404``).
    Returns False on any failure, mirroring the helper."""
    from .ast import Field, Index, Key  # local import to avoid cycle

    mv = xml_to_map(xml_text)
    if mv is None:
        return False
    # Convert AST segments to mxj path parts.
    parts: List[str] = []
    for seg in segments:
        if isinstance(seg, Field):
            parts.append(seg.name)
        elif isinstance(seg, Key):
            parts.append(seg.key)
        elif isinstance(seg, Index):
            if parts:
                parts[-1] = f"{parts[-1]}[{seg.index}]"
            else:
                parts.append(f"[{seg.index}]")
        else:
            return False
    result = _values_for_path(mv, parts)
    if not result:
        return False
    value = result[0]
    if isinstance(value, str):
        return value
    if isinstance(value, dict) and "#text" in value:
        return value["#text"]
    return False


def _set_value_for_path(obj: Any, parts: List[str], value: Any) -> None:
    if not parts:
        return
    *parents, last = parts
    containers = _values_for_path(obj, parents) if parents else [obj]
    idx = None
    m = _SUBSCRIPT.match(last)
    if m:
        last, idx = m.group(1), int(m.group(2))
    for c in containers:
        if isinstance(c, dict) and last in c:
            if idx is not None:
                v = c[last]
                if isinstance(v, list) and 0 <= idx < len(v):
                    v[idx] = value
            else:
                c[last] = value


def map_to_xml(obj: dict) -> str:
    """mxj ``Map.Xml()``: keys serialized in alphabetical order, ``-``
    attrs restored, ``#text`` inlined. No declaration, no whitespace."""
    parts: List[str] = []
    for tag in sorted(obj.keys()):
        _value_to_xml(tag, obj[tag], parts)
    return "".join(parts)


def _escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def _attr_escape(s: str) -> str:
    return _escape(s).replace('"', "&quot;")


def _value_to_xml(tag: str, value: Any, out: List[str]) -> None:
    if isinstance(value, list):
        for item in value:
            _value_to_xml(tag, item, out)
        return
    if isinstance(value, dict):
        attrs = {k[1:]: v for k, v in value.items() if k.startswith("-")}
        attr_str = "".join(
            f' {k}="{_attr_escape(str(v))}"' for k, v in sorted(attrs.items())
        )
        inner_keys = sorted(k for k in value.keys() if not k.startswith("-"))
        out.append(f"<{tag}{attr_str}>")
        for k in inner_keys:
            if k == "#text":
                out.append(_escape(str(value[k])))
            else:
                _value_to_xml(k, value[k], out)
        out.append(f"</{tag}>")
        return
    out.append(f"<{tag}>{_escape(str(value))}</{tag}>")


def xml_redact(value: Any, path: str, redacted: str) -> Optional[str]:
    """Port of ``redactXml`` (eval.go:406-439): base64 probe, parse, set
    path to the redaction marker, re-serialize (alphabetical), re-prepend
    the declaration line, re-encode base64 if the input was base64."""
    if not isinstance(value, str):
        return None
    text, was_b64 = pyeval.try_base64(value)
    mv = xml_to_map(text)
    if mv is None:
        return None
    parts = [p for p in path.split(".") if p]
    _set_value_for_path(mv, parts, redacted)
    new_xml = map_to_xml(mv)
    if len(text) > 2 and text[0:2] == "<?":
        decl = text.splitlines()[0]
        new_xml = f"{decl}\n{new_xml}"
    if was_b64:
        new_xml = base64.b64encode(new_xml.encode("utf-8")).decode("ascii")
    return new_xml
