"""Fields — ordered, unique field-name lists (the reference's schema object).

Parity: ``backtype/storm/tuple/Fields.java:28-54`` — an ordered list of unique
field names with name->index lookup and ``select`` projection. The engine pairs
these names with real Spark types (StructType) at plan time; ``Fields`` remains
the user-facing sugar, accepted anywhere a column list is expected.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator


class Fields:
    """An ordered list of unique field names."""

    def __init__(self, *names: str | Iterable[str]) -> None:
        flat: list[str] = []
        for n in names:
            if isinstance(n, str):
                flat.append(n)
            else:
                flat.extend(n)
        seen: set[str] = set()
        for f in flat:
            if f in seen:
                raise ValueError(f"duplicate field name: {f!r}")
            seen.add(f)
        self._names = flat
        self._index = {f: i for i, f in enumerate(flat)}

    def to_list(self) -> list[str]:
        return list(self._names)

    def contains(self, name: str) -> bool:
        return name in self._index

    def field_index(self, name: str) -> int:
        """Parity: ``Fields.java:56-62`` (throws on unknown field)."""
        if name not in self._index:
            raise ValueError(f"{name!r} does not exist")
        return self._index[name]

    def select(self, selector: "Fields | Iterable[str]") -> list[str]:
        """Project a subset by name. Parity: ``Fields.java:48-54``."""
        sel = selector.to_list() if isinstance(selector, Fields) else list(selector)
        for f in sel:
            self.field_index(f)
        return sel

    def __iter__(self) -> Iterator[str]:
        return iter(self._names)

    def __len__(self) -> int:
        return len(self._names)

    def __getitem__(self, i: int) -> str:
        return self._names[i]

    def __eq__(self, other: object) -> bool:
        if isinstance(other, Fields):
            return self._names == other._names
        if isinstance(other, (list, tuple)):
            return self._names == list(other)
        return NotImplemented

    def __hash__(self) -> int:
        return hash(tuple(self._names))

    def __repr__(self) -> str:
        return f"Fields({', '.join(map(repr, self._names))})"


def as_field_list(fields: "Fields | Iterable[str] | str | None") -> list[str] | None:
    """Normalize user input (Fields | list | single name | None) to list[str]."""
    if fields is None:
        return None
    if isinstance(fields, str):
        return [fields]
    if isinstance(fields, Fields):
        return fields.to_list()
    return list(fields)
