"""Full ODK→OSM conversion engine — the engine's re-expression of the
reference's YAML-driven converter (`osm_merge/fieldwork/convert.py:47-339`
with the default config `osm_merge/fieldwork/xforms.yaml`).

The reference applies, per submission field:

- **tag rename** (`convertTag`, `convert.py:279-310`): ``convert`` entries
  with a string value rename the tag, keeping only the part before ``=``;
- **value tables** (`convertValue`, `convert.py:234-277`): ``convert``
  entries with a *mapping* value translate a specific field value into one
  or more OSM ``k=v`` pairs (comma-separated specs, e.g.
  ``coffee: amenity=cafe,cuisine=coffee_shop``); booleans become yes/no;
- **select-multiple** (`convertMultiple`, `convert.py:312-339`):
  space-separated choice lists become OSM tags — a choice with a ``k=v``
  conversion contributes that pair (same-key pairs semicolon-joined), an
  unknown choice becomes ``choice=yes``;
- **ignore / private** (`ignoreData`/`privateData`, `convert.py:97-140`):
  metadata fields are dropped; ``private`` fields belong in a separate
  non-OSM output.

Spark-first shape: the conversion tables are small driver-side constants,
so the WHOLE engine compiles into one Column expression over the
``map<string,string>`` tags column — literal lookup maps plus SQL
higher-order functions (``transform``/``flatten``/``aggregate``).  No
Python in the row path, works unchanged at 100 TB, and applies uniformly
downstream of the CSV, JSON and XML readers (`sources/odk.py`).

Faithfully-mirrored reference quirks (each pinned in
`tests/test_odk.py::TestConvertEngine`):

- lookups lowercase the tag but the config keys are stored verbatim
  (`convert.py:74-89` vs `:125`), so capitalized config keys — the
  ``Monday``→``Mo`` weekday block of xforms.yaml — are dead entries;
- a tag whose *renamed* target is itself a string-valued convert key
  returns an empty conversion (`convertValue` returns ``[]`` for string
  table entries, `convert.py:251-254,277`) — e.g. ``livestock`` renames to
  ``drinking_water`` which is itself a convert key, so the field vanishes;
- in ``convertMultiple`` a choice that has a string conversion WITHOUT
  ``=`` contributes nothing (`convert.py:328-337` only updates tags in the
  ``=`` branch and the not-converted branch).

Documented deviations (reference bugs not copied):

- the JSON/XML parsers keep only the FIRST pair of a multi-pair value
  conversion (``tags.update(items[0])``, `parsers.py:278,352`); the CSV
  parser keeps all pairs (`parsers.py:160-163`) — this engine keeps all
  pairs on every path;
- a select-multiple choice that maps to a *mapping* config entry would
  crash the reference (``dict.find``, `convert.py:330`); here it is
  dropped.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Default config — the parsed shape of the reference's public
# `fieldwork/xforms.yaml` (keys verbatim, including the dead capitalized
# weekday block; see module docstring).
# ---------------------------------------------------------------------------

DEFAULT_CONVERT: dict[str, str | dict] = {
    "camptype": "tourism",
    "openfire": "leisure=firepit",
    "fire_pit": "leisure=firepit",
    "picnic_table": "leisure=picnic_table",
    "latitude": "lat",
    "longitude": "lon",
    "altitude": "ele",
    "submitterid": "uid",
    "submittername": "user",
    "submissiondate": "timestamp",
    "comment": "note",
    "view": "viewpoint",
    "Monday": "Mo",
    "Tuesday": "Tu",
    "Wednesday": "We",
    "Thursday": "Th",
    "Friday": "Fr",
    "Saturday": "Sa",
    "Sunday": "Su",
    "waterpoint_name": "name",
    "cemetery_name": "name",
    "waterpoint_type": "man_made",
    "faucet": "valve=yes",
    "well": "well=yes",
    "borehole": "borehole=yes",
    "drinkable_water": "amenity=drinking_water",
    "drinking_water": "amenity=drinking_water",
    "irrigation": "irrigation=yes",
    "livestock": "drinking_water=no",
    "waterpoint_code": "ref",
    "pump_type": "pump",
    "waterpoint_access": "access",
    "fee": "fee=yes",
    "power_type": "power_source",
    "provider": "operator:type",
    "operator_type": "operator:type",
    "cemetery_services": {"cemetery": "amenity=grave_yard", "cremation": "amenity=crematorium"},
    "xid": "id",
    "food": "amenity",
    "brewery": "craft=brewery",
    "housing": "building",
    "xlocation": "geometry",
    "coordinates": "geometry",
    "healthcare_type": "healthcare",
    "building_material": "building:material",
    "floors": "building:levels",
    "roof_material": "roof:material",
    "building_condition": "building:condition",
    "building_floor": "building:floor",
    "building_prefab": "building:prefabricated",
    "building_levels": "building:levels",
    "levels_underground": "building:levels:underground",
    "emergency": {
        "fire_station": "amenity=fire_station",
        "police": "amenity=police",
        "hospital": "amenity=hospital",
        "clinic": "amenity=clinic",
        "toilets": "amenity=toilets",
    },
    "amenity": {"coffee": "amenity=cafe,cuisine=coffee_shop"},
    "goverment": "amenity",
}

DEFAULT_PRIVATE: list[str] = [
    "building_material_other", "flood_prone", "under_construction",
    "toilets_number", "building_damage", "building_type", "addr_district",
    "addr_sector", "addr_cell", "addr_village", "evacuation_center",
    "income", "age", "gender", "education", "waterpoint_type_other",
    "waterpoint_provider", "waterpoint_provider_other",
    "waterpoint_capacity", "waterpoint_quantity", "waterpoint_access",
    "waterpoint_access_other", "waterpoint_elevation", "waterpoint_mgmt",
    "fee_cost", "end_time", "locality", "municipality", "town", "place",
    "district", "elev", "area", "geological_site", "lateral_material",
    "lateral_system", "access_roof", "updatedat", "cell", "cellular",
]

DEFAULT_IGNORE: list[str] = [
    "object_type", "__id", "model", "type", "accuracy", "meta", "__system",
    "status", "reviewstate", "formversion", "edits", "attachmentsexpected",
    "attachmentspresent", "gps_type", "deviceid", "key", "start", "end",
    "today", "audio", "image", "phonenumber", "detail", "highway_type",
    "waterpoint_img", "enum_name", "username", "email", "category",
    "existing", "building_menu", "food_menu", "medical_menu", "retail_menu",
    "government_menu", "note", "instanceid", "begin_group", "end_group",
]

DEFAULT_MULTIPLE: list[str] = ["healthcare", "amenity_type", "specialty", "features"]


class XFormsConfig:
    """Parsed conversion config — the reference's ``Convert`` state
    (`convert.py:55-95`) as plain driver-side data."""

    def __init__(
        self,
        convert: dict[str, str | dict] | None = None,
        ignore: list[str] | None = None,
        private: list[str] | None = None,
        multiple: list[str] | None = None,
    ):
        self.convert = DEFAULT_CONVERT if convert is None else convert
        self.ignore = list(DEFAULT_IGNORE if ignore is None else ignore)
        self.private = list(DEFAULT_PRIVATE if private is None else private)
        self.multiple = list(DEFAULT_MULTIPLE if multiple is None else multiple)

    @classmethod
    def default(cls) -> "XFormsConfig":
        return cls()

    @classmethod
    def from_yaml(cls, path: str) -> "XFormsConfig":
        """Load a user xforms YAML (same shape as the reference's:
        ``convert`` is a list of single-key maps whose values are strings
        or lists of strings/maps, `convert.py:74-89`)."""
        import yaml

        with open(path) as fd:
            doc = yaml.safe_load(fd)
        convert: dict[str, str | dict] = {}
        for item in doc.get("convert", []):
            key = list(item.keys())[0]
            value = item[key]
            if isinstance(value, str):
                convert[key] = value
            elif isinstance(value, list):
                vals: dict = {}
                for entry in value:
                    if not isinstance(entry, str):
                        tag = list(entry.keys())[0]
                        vals[tag] = entry[tag]
                convert[key] = vals
        return cls(
            convert=convert,
            ignore=doc.get("ignore", []),
            private=doc.get("private", []),
            multiple=doc.get("multiple", []),
        )

    # -- driver-side truth (used by the truth-table tests and to compile
    # -- the literal lookup maps below) ------------------------------------

    def convert_tag(self, tag: str) -> str:
        """`convertTag` (`convert.py:279-310`): string entries rename to
        the pre-``=`` part, mapping entries keep the tag."""
        low = tag.lower()
        v = self.convert.get(low)
        if isinstance(v, str):
            return v.split("=")[0].lower()
        return low

    def convert_value(self, tag: str, value: str) -> list[tuple[str, str]] | None:
        """`convertValue` (`convert.py:234-277`) on the RENAMED tag:
        ``None`` = no table (pass the value through); ``[]`` = the
        string-entry quirk (field vanishes); else the converted pairs."""
        vals = self.convert.get(tag)
        if vals is None:
            return None
        if not isinstance(vals, dict):
            return []  # string table entry: reference returns an empty list
        if value not in vals:
            return [(tag, value)]
        spec = vals[value]
        if isinstance(spec, bool):
            return [(tag, "yes" if spec else "no")]
        out: list[tuple[str, str]] = []
        for item in spec.split(","):
            kv = item.split("=")
            out.append((tag, spec) if len(kv) == 1 else (kv[0], kv[1]))
        return out

    def convert_entry(self, tag: str, value: str) -> list[tuple[str, str]]:
        """`convertEntry` (`convert.py:181-232`): rename → ele-truncate →
        value table; untouched tags pass through."""
        low = tag.lower()
        if low in self.ignore:
            return []
        if low not in self.convert and low not in self.private:
            return [(low, value)]
        newtag = self.convert_tag(low)
        if newtag == "ele":
            value = value[:7]  # `convert.py:217-219`
        pairs = self.convert_value(newtag, value)
        if pairs is None:
            return [(newtag, value)]
        return pairs

    def convert_multiple(self, value: str) -> list[tuple[str, str]]:
        """`convertMultiple` (`convert.py:312-339`): space-separated
        choices → pairs, same-key values semicolon-joined in first-seen
        order; converted-without-``=`` choices vanish (quirk)."""
        tags: dict[str, str] = {}
        for token in value.split(" "):
            low = token.lower()
            spec = self.convert.get(low)
            if spec is not None:
                if isinstance(spec, str) and "=" in spec:
                    k, v = spec.split("=", 1)
                    tags[k] = f"{tags[k]};{v}" if k in tags else v
                # no-``=`` string or mapping entry: dropped (module docstring)
            else:
                tags[low] = "yes"
        return list(tags.items())


# ---------------------------------------------------------------------------
# Compiled Column engine
# ---------------------------------------------------------------------------

_SEP = "\x1f"  # tag/value separator inside the value-table literal keys

def _empty_map() -> Column:
    # built lazily: Column construction touches the JVM, so a module-level
    # constant would require an active session at import time
    return F.map_from_arrays(
        F.array().cast("array<string>"), F.array().cast("array<string>")
    )


def _entry(k: Column | str, v: Column | str) -> Column:
    key = k if isinstance(k, Column) else F.lit(k)
    val = v if isinstance(v, Column) else F.lit(v)
    return F.struct(key.alias("key"), val.alias("value"))


def _entry_array_lit(pairs: list[tuple[str, str]]) -> Column:
    if not pairs:
        return F.array().cast("array<struct<key:string,value:string>>")
    return F.array(*[_entry(k, v) for k, v in pairs])


def _lit_map(pairs: dict[str, Column]) -> Column:
    cols: list[Column] = []
    for k, v in pairs.items():
        cols += [F.lit(k), v]
    return F.create_map(*cols)


def _last_wins(entries: Column) -> Column:
    """array<struct<key,value>> → map with dict.update() semantics
    (`parsers.py:160-163`): later entries overwrite earlier keys."""
    return F.aggregate(
        entries,
        _empty_map(),
        lambda acc, e: F.map_concat(
            F.map_filter(acc, lambda k, _v: k != e["key"]),
            F.create_map(e["key"], e["value"]),
        ),
    )


def _semicolon_join(entries: Column) -> Column:
    """array<struct<key,value>> → map joining same-key values with ``;``
    (`convert.py:332-335`)."""
    return F.aggregate(
        entries,
        _empty_map(),
        lambda acc, e: F.when(
            F.map_contains_key(acc, e["key"]),
            F.map_concat(
                F.map_filter(acc, lambda k, _v: k != e["key"]),
                F.create_map(e["key"], F.concat_ws(";", F.element_at(acc, e["key"]), e["value"])),
            ),
        ).otherwise(F.map_concat(acc, F.create_map(e["key"], e["value"]))),
    )


def _compile_tables(cfg: XFormsConfig):
    """Driver-side constants → literal lookup Columns."""
    rename = {
        k: F.lit(v.split("=")[0].lower())
        for k, v in cfg.convert.items()
        if isinstance(v, str)
    }
    # renamed targets that are themselves string table entries: the
    # convertValue quirk drops the field entirely
    quirk_drop = sorted(
        {
            t
            for t in (
                [v.split("=")[0].lower() for v in cfg.convert.values() if isinstance(v, str)]
                + [k for k in cfg.convert]
            )
            if isinstance(cfg.convert.get(t), str)
        }
    )
    # value tables, keyed "newtag<SEP>value" (ele-truncated values are the
    # caller's concern — the lookup key uses the post-truncation value)
    vt: dict[str, Column] = {}
    for tag, vals in cfg.convert.items():
        if not isinstance(vals, dict):
            continue
        for value in vals:
            pairs = cfg.convert_value(tag, value)
            vt[f"{tag}{_SEP}{value}"] = _entry_array_lit(pairs or [])
    # select-multiple choice table: choice → entry array ([] = quirk drop)
    mult: dict[str, Column] = {}
    for k, v in cfg.convert.items():
        if isinstance(v, str) and "=" in v:
            kk, vv = v.split("=", 1)
            mult[k] = _entry_array_lit([(kk, vv)])
        else:
            mult[k] = _entry_array_lit([])
    return rename, quirk_drop, vt, mult


def convert_tags(
    tags: Column | str,
    cfg: XFormsConfig | None = None,
    drop_private: bool = False,
) -> Column:
    """The full conversion engine over a ``map<string,string>`` tags
    column: rename + value tables + select-multiple + ignore (and
    optionally private) stripping, in one Column expression.

    ``drop_private=True`` additionally strips the ``private`` fields (the
    reference routes them to a separate non-OSM file — pair with
    :func:`private_tags` to keep them)."""
    cfg = cfg or XFormsConfig.default()
    tags = F.col(tags) if isinstance(tags, str) else tags
    rename, quirk_drop, vt, mult = _compile_tables(cfg)
    rename_map = _lit_map(rename) if rename else None
    vt_map = _lit_map(vt) if vt else None
    mult_map = _lit_map(mult) if mult else None
    ignore_arr = F.array(*[F.lit(x) for x in cfg.ignore]) if cfg.ignore else None
    private_arr = F.array(*[F.lit(x) for x in cfg.private]) if cfg.private else None
    touched = sorted({k.lower() for k in cfg.convert} | set(cfg.ignore) | set(cfg.private))
    touched_arr = F.array(*[F.lit(x) for x in touched]) if touched else None
    mult_cols = F.array(*[F.lit(x.lower()) for x in cfg.multiple]) if cfg.multiple else None
    quirk_arr = F.array(*[F.lit(x) for x in quirk_drop]) if quirk_drop else None
    empty = _entry_array_lit([])

    def one(e: Column) -> Column:
        base = F.lower(e["key"])
        newtag = (
            F.coalesce(F.element_at(rename_map, base), base) if rename is not None and rename else base
        )
        val = F.when(newtag == "ele", F.substring(e["value"], 1, 7)).otherwise(e["value"])
        converted = (
            F.coalesce(
                F.element_at(vt_map, F.concat(newtag, F.lit(_SEP), val)),
                F.array(_entry(newtag, val)),
            )
            if vt
            else F.array(_entry(newtag, val))
        )
        if quirk_arr is not None:
            converted = F.when(F.array_contains(quirk_arr, newtag), empty).otherwise(converted)
        # select-multiple: split on spaces, per-choice table, ';'-join
        if mult_cols is not None:
            tokens = F.split(e["value"], " ")
            tok_entries = F.flatten(
                F.transform(
                    tokens,
                    lambda t: F.coalesce(
                        F.element_at(mult_map, F.lower(t)),
                        F.array(_entry(F.lower(t), F.lit("yes"))),
                    ),
                )
            )
            mult_entries = F.map_entries(_semicolon_join(tok_entries))
        out = F.array(_entry(base, e["value"]))  # untouched pass-through
        out = F.when(
            ~F.array_contains(touched_arr, base) if touched_arr is not None else F.lit(True),
            out,
        ).otherwise(converted)
        if mult_cols is not None:
            out = F.when(F.array_contains(mult_cols, base), mult_entries).otherwise(out)
        if private_arr is not None and drop_private:
            out = F.when(F.array_contains(private_arr, base), empty).otherwise(out)
        if ignore_arr is not None:
            out = F.when(F.array_contains(ignore_arr, base), empty).otherwise(out)
        # reference skips empty values before converting (`parsers.py:118`)
        return F.when(F.length(e["value"]) > 0, out).otherwise(empty)

    flat = F.flatten(F.transform(F.map_entries(tags), one))
    return _last_wins(flat)


def private_tags(tags: Column | str, cfg: XFormsConfig | None = None) -> Column:
    """The ``private`` fields only (`privateData`, `convert.py:97-110`) —
    the non-OSM output the reference routes to a separate file."""
    cfg = cfg or XFormsConfig.default()
    tags = F.col(tags) if isinstance(tags, str) else tags
    if not cfg.private:
        return _empty_map()
    private_arr = F.array(*[F.lit(x) for x in cfg.private])
    return F.map_filter(tags, lambda k, _v: F.array_contains(private_arr, F.lower(k)))
