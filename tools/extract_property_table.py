#!/usr/bin/env python
"""Extract the SOAP property-table API contract into a JSON data file.

The reference framework defines its output catalogue schema as a static
table of ~304 ``Property(...)`` entries (``SOAP/property_table.py:334`` in
the reference checkout).  That table is the *API contract* of the output
catalogue: dataset names, shapes, dtypes, units, descriptions, compression
filters, DMO availability, required particle datasets, physical/comoving
convention and a-scale exponents.  A rebuilt framework must reproduce these
verbatim or its catalogues are incompatible with every downstream consumer.

This script parses the reference source with ``ast`` (it cannot be imported
here: its dependency stack is unavailable) and emits the *data* — not the
code — as ``soap_tpu/core/property_table.json``.  The registry code that
consumes the JSON lives in ``soap_tpu/core/registry.py`` and is an
independent design.

Usage:  python tools/extract_property_table.py [reference_path] [output_json]
"""

import ast
import json
import sys


def literal(node):
    """Evaluate the restricted expression forms used in the table."""
    if isinstance(node, ast.Constant):
        return node.value
    if isinstance(node, ast.Attribute):
        # np.float32 / np.float64 / np.int32 / np.int64 / np.uint64 / np.bool_
        return node.attr
    if isinstance(node, (ast.List, ast.Tuple)):
        return [literal(e) for e in node.elts]
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
        return -literal(node.operand)
    if isinstance(node, ast.Call):
        # e.g. np.dtype("float32")
        return literal(node.args[0]) if node.args else None
    if isinstance(node, ast.Name):
        return node.id
    raise ValueError(f"unhandled node {ast.dump(node)[:120]}")


def main():
    ref = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "soap_tpu/core/property_table.json"
    )
    src = open(f"{ref}/SOAP/property_table.py").read()
    tree = ast.parse(src)

    # Find the PropertyTable class, then its full_property_list assignment.
    table = {}
    footnotes = {}
    for cls in ast.walk(tree):
        if not (isinstance(cls, ast.ClassDef) and cls.name == "PropertyTable"):
            continue
        for stmt in cls.body:
            if not isinstance(stmt, ast.Assign):
                continue
            target = stmt.targets[0]
            if not isinstance(target, ast.Name):
                continue
            if target.id == "full_property_list":
                for key_node, val_node in zip(
                    stmt.value.keys, stmt.value.values
                ):
                    key = key_node.value
                    assert isinstance(val_node, ast.Call)
                    kw = {k.arg: literal(k.value) for k in val_node.keywords}
                    pos = [literal(a) for a in val_node.args]
                    names = [
                        "name",
                        "shape",
                        "dtype",
                        "unit",
                        "description",
                        "lossy_compression_filter",
                        "dmo_property",
                        "particle_properties",
                        "output_physical",
                        "a_scale_exponent",
                    ]
                    entry = dict(zip(names, pos))
                    entry.update(kw)
                    table[key] = entry
            elif target.id == "explanation":
                for k, v in zip(stmt.value.keys, stmt.value.values):
                    footnotes[k.value] = literal(v)

    data = {
        "source": "SOAP/property_table.py (reference API contract)",
        "properties": table,
        "footnotes": footnotes,
    }
    with open(out, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    print(f"extracted {len(table)} properties -> {out}")


if __name__ == "__main__":
    main()
