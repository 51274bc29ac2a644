"""Typed SAM optional-field ("attribute") parsing.

Mirrors the reference's AttributeUtils (util/AttributeUtils.scala:28-130)
and Attribute (models/Attribute.scala): a tab-separated tag string like
``XT:i:3\tXU:Z:foo,bar`` parses into typed :class:`Attribute` values;
``B``-typed tags carry their element format (``c/C/s/S/i/I/f``) and
decode to numeric lists; ``H`` decodes hex bytes. Malformed tags raise
``ValueError`` (the reference raises IllegalArgumentException —
AttributeUtilsSuite.scala:68, 97).

This repo stores attributes engine-side as a ``map<string,string>`` of
``TAG -> "TYPE:VALUE"`` (sources/sam.py:75-83), which Catalyst handles
natively; the typed objects here are the driver/worker-side accessor
for user code, matching RichAlignment.tags.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from enum import Enum

from pyspark.sql import Column
from pyspark.sql import functions as F


class TagType(str, Enum):
    """SAM tag types (models/TagType.scala); the value is the SAM text
    form re-emitted by ``str(attribute)``."""

    CHARACTER = "A"
    INTEGER = "i"
    FLOAT = "f"
    STRING = "Z"
    BYTE_SEQUENCE = "H"
    NUMERIC_BYTE_SEQUENCE = "B:c"
    NUMERIC_UNSIGNED_BYTE_SEQUENCE = "B:C"
    NUMERIC_SHORT_SEQUENCE = "B:s"
    NUMERIC_UNSIGNED_SHORT_SEQUENCE = "B:S"
    NUMERIC_INT_SEQUENCE = "B:i"
    NUMERIC_UNSIGNED_INT_SEQUENCE = "B:I"
    NUMERIC_FLOAT_SEQUENCE = "B:f"


@dataclass(frozen=True)
class Attribute:
    """One typed optional field (models/Attribute.scala)."""

    tag: str
    tag_type: TagType
    value: object

    def __str__(self) -> str:
        if self.tag_type.value.startswith("B:"):
            fmt = self.tag_type.value[2]
            return "%s:B:%s,%s" % (
                self.tag, fmt, ",".join(str(v) for v in self.value)
            )
        return f"{self.tag}:{self.tag_type.value}:{self.value}"


#: tag:type:value — tag is 2-4 non-colon chars, type one of AifZHB
#: (AttributeUtils.scala:31 attrRegex); DOTALL so values keep newlines
_ATTR_RE = re.compile(r"([^:]{2,4}):([AifZHB]):(.*)", re.S)
#: B-array values lead with their element format (:32 arrayRegex)
_ARRAY_RE = re.compile(r"([cCiIsSf],)(.*)", re.S)

_ARRAY_TYPES = {
    "c": TagType.NUMERIC_BYTE_SEQUENCE,
    "C": TagType.NUMERIC_UNSIGNED_BYTE_SEQUENCE,
    "s": TagType.NUMERIC_SHORT_SEQUENCE,
    "S": TagType.NUMERIC_UNSIGNED_SHORT_SEQUENCE,
    "i": TagType.NUMERIC_INT_SEQUENCE,
    "I": TagType.NUMERIC_UNSIGNED_INT_SEQUENCE,
    "f": TagType.NUMERIC_FLOAT_SEQUENCE,
}


def parse_attribute(encoded: str) -> Attribute:
    """``TAG:TYPE:VALUE`` → :class:`Attribute`
    (AttributeUtils.parseAttribute:80-89). Values may contain ``:`` and
    ``,`` freely (AttributeUtilsSuite:75-91 OQ cases)."""
    m = _ATTR_RE.fullmatch(encoded)
    if not m:
        raise ValueError(
            f'attribute string "{encoded}" doesn\'t match format '
            "attrTuple:type:value"
        )
    tag, type_char, raw = m.groups()
    if type_char == "A":
        return Attribute(tag, TagType.CHARACTER, raw)
    if type_char == "i":
        return Attribute(tag, TagType.INTEGER, int(raw))
    if type_char == "f":
        return Attribute(tag, TagType.FLOAT, float(raw))
    if type_char == "Z":
        return Attribute(tag, TagType.STRING, raw)
    if type_char == "H":
        return Attribute(tag, TagType.BYTE_SEQUENCE, bytes.fromhex(raw))
    # B: array tags must declare their element format
    am = _ARRAY_RE.fullmatch(raw)
    if not am:
        raise ValueError(f"Array tags must define array format. For tag {encoded}.")
    fmt, body = am.group(1)[0], am.group(2)
    tag_type = _ARRAY_TYPES[fmt]
    conv = float if fmt == "f" else int
    values = [conv(v) for v in body.split(",")] if body else []
    return Attribute(tag, tag_type, values)


def parse_attributes(tag_strings: str) -> list[Attribute]:
    """Tab-separated tag string → typed attributes
    (AttributeUtils.parseAttributes:73-74)."""
    return [parse_attribute(t) for t in tag_strings.split("\t") if t]


def attributes_from_map(attrs: dict[str, str] | None) -> list[Attribute]:
    """Engine-side ``TAG -> "TYPE:VALUE"`` map (sources/sam.py loader
    form) → typed attributes."""
    if not attrs:
        return []
    return [parse_attribute(f"{k}:{v}") for k, v in attrs.items()]


def tag_value(attrs: Column, tag: str) -> Column:
    """Raw string value of one tag from the engine-side attributes map,
    type prefix stripped — the Catalyst accessor the loaders use for
    MD/RG/OQ (sources/sam.py:114-117); null-safe under ANSI."""
    return F.substring(F.try_element_at(attrs, F.lit(tag)), 3, 1_000_000)
