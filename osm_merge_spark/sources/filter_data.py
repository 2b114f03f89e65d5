"""Category → choice-list data-model filtering (the reference's
``fieldwork/filter_data.py``), re-expressed as compiled Column expressions.

The reference utility has two halves:

* ``FilterData.parse`` (``filter_data.py:48-115``) reads an XLSForm
  spreadsheet and builds ``{list_name: [choice, ...]}`` plus a keep-column
  list.  XLSForm spreadsheet I/O is out of scope (agreed since round 1), so
  :func:`parse_choices` takes the already-parsed choices sheet as plain rows
  and reproduces the reference's row-selection truth table exactly.
* ``FilterData.cleanData`` (``filter_data.py:117-198``) rebuilds each
  GeoJSON feature's properties.  Its *documented* data-model filter (keep a
  tag only when its value is in the model's choice list) is DEAD CODE in
  the reference — the branch sits behind a literal ``if True`` hack
  (``filter_data.py:153``), so the shipped behavior is the flatten/
  title/label path.  We implement BOTH:

  - :func:`filter_tags_by_model` — the documented model filter, live here
    (the dead-branch semantics, pinned by tests/test_filter_data.py);
  - :func:`clean_properties` — the live flatten path: ``tags`` entries keyed
    ``name*`` route to ``title``/``label`` (and are dropped from the map),
    ``osm_id`` becomes ``id`` and the title fallback.

Reference quirks deliberately NOT copied (documented, tested against the
sane behavior instead):

* ``cleanData``'s title/label are last-writer-wins over the *insertion
  order* of the input properties dict (``filter_data.py:156-169``) — the
  engine makes the choice deterministic: the first ``name*`` tag in key
  order wins, falling back to ``osm_id``.
* the dead branch would set ``title`` to the model's whole choice LIST for
  ``name``/``name:en`` keys (``filter_data.py:178-179``) — a type bug; the
  engine uses the tag's value.

Quirks faithfully mirrored (each pinned in tests/test_filter_data.py):

* ``parse`` starts at choices-sheet row index 1, silently skipping row 0
  (``filter_data.py:78-79``);
* list name ``model`` and NaN keys are skipped; choice names ``<text>`` and
  the string ``"null"`` are skipped (``filter_data.py:81-87``);
* a value absent from the model's list is dropped; the ``"yes"`` value is
  dropped *silently* while others would warn (``filter_data.py:180-185``) —
  either way the tag does not survive;
* keep-columns always survive unfiltered (``filter_data.py:145,173-175``).
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# filter_data.py:96-110 — the default SELECT keep set the YAML config extends
DEFAULT_KEEP = (
    "name",
    "name:en",
    "id",
    "operator",
    "addr:street",
    "addr:housenumber",
    "osm_id",
    "title",
    "tags",
    "label",
    "landuse",
    "opening_hours",
    "tourism",
)

# filter_data.py:140-144 — dropped silently (log noise suppression)
DEFAULT_IGNORE = ("timestamp", "version", "changeset")

# filter_data.py:145 — property keys that always survive cleanData
CLEAN_KEEP = ("osm_id", "id", "version")


def parse_choices(
    rows: Sequence[Mapping[str, object]],
    config_keep: Iterable[str] = (),
) -> tuple[dict[str, list[str]], list[str]]:
    """Reference ``FilterData.parse``'s choices-sheet truth table
    (``filter_data.py:77-113``) over already-parsed rows
    (``[{"list_name": ..., "name": ...}, ...]``).

    Returns ``(model, keep)`` where ``model`` maps each choice-list name to
    its allowed values and ``keep`` is DEFAULT_KEEP extended by the config's
    own keep columns.
    """
    model: dict[str, list[str]] = {}
    # reference quirk: iteration starts at index 1 — row 0 never contributes
    for row in list(rows)[1:]:
        key = row.get("list_name")
        if key is None or key == "model" or str(key) == "nan":
            continue
        value = row.get("name")
        if value == "<text>" or str(value) == "null" or value is None:
            continue
        model.setdefault(str(key), []).append(str(value))
    keep = list(DEFAULT_KEEP)
    keep.extend(config_keep)
    return model, keep


def model_literal(model: Mapping[str, Sequence[str]]) -> Column:
    """The data model as one literal ``map<string, array<string>>`` Column —
    driver-side table compiled into the plan, same pattern as
    ``odk_convert``'s conversion table (no joins, no UDFs)."""
    items = sorted(model.items())
    if not items:
        return F.map_from_arrays(
            F.array().cast("array<string>"), F.array().cast("array<array<string>>")
        )
    keys = F.array(*[F.lit(k) for k, _ in items])
    vals = F.array(*[F.array(*[F.lit(str(v)) for v in vs]) for _, vs in items])
    return F.map_from_arrays(keys, vals)


def filter_tags_by_model(
    tags: Column,
    model: Mapping[str, Sequence[str]],
    keep: Sequence[str] = CLEAN_KEEP,
    ignore: Sequence[str] = DEFAULT_IGNORE,
) -> Column:
    """The documented category filter (``filter_data.py:173-190``, the
    reference's dead branch): keep a tag entry iff

    * its key is in ``keep`` (always survives), or
    * its key is a model category AND its value is in that category's choice
      list (a value outside the list is dropped — the reference would warn
      except for the silent ``"yes"`` case; either way it does not survive).

    Keys outside the model (including the ``ignore`` noise set) are dropped.
    Pure ``map_filter`` over a literal model map — JVM-side, no shuffle, no
    Python: at 100 TB this is a row-local projection that pushes through
    whole-stage codegen.
    """
    m = model_literal(model)
    keep_arr = F.array(*[F.lit(k) for k in keep]) if keep else F.array().cast("array<string>")
    return F.map_filter(
        tags,
        lambda k, v: F.array_contains(keep_arr, k)
        | F.coalesce(F.array_contains(F.try_element_at(m, k), v), F.lit(False)),
    )


def title_from_tags(tags: Column, osm_id: Column) -> Column:
    """Deterministic title/label choice: the first ``name*`` tag value in
    key order, else ``osm_id`` (``filter_data.py:156-169,191-193``; the
    reference's insertion-order last-writer-wins is the quirk not copied —
    see module docstring)."""
    names = F.array_sort(
        F.map_entries(F.map_filter(tags, lambda k, v: k.startswith("name")))
    )
    # try_element_at: ANSI-safe on the no-name*-tag rows (empty array)
    return F.coalesce(F.try_element_at(names, F.lit(1))["value"], osm_id.cast("string"))


def clean_properties(tags: Column, osm_id: Column) -> Column:
    """The live ``cleanData`` path (``filter_data.py:147-195``): a struct of

    * ``id`` — ``osm_id`` (``filter_data.py:162-163``),
    * ``title``/``label`` — first ``name*`` tag, else ``osm_id``,
    * ``properties`` — the tags map with ``name*`` keys removed (they were
      routed to title/label, ``filter_data.py:155-160``).
    """
    title = title_from_tags(tags, osm_id)
    return F.struct(
        osm_id.cast("string").alias("id"),
        title.alias("title"),
        title.alias("label"),
        F.map_filter(tags, lambda k, v: ~k.startswith("name")).alias("properties"),
    )
