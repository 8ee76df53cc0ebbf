"""Turtle / JSON-LD / RDF-XML ingest (S6) — document-level RDF formats.

The reference parses every RDF serialization through Jena in `_in`
(InputHandler.scala:67,259,375 dispatch; LDFormatParser.scala). N-Triples/
N-Quads are line-splittable and stay on the JVM regex path (sources/rdf.py);
the three document formats here cannot be split mid-file, so the Spark
shape is: ONE ROW PER FILE (`spark.read.text(..., wholetext=True)`) ->
`mapInPandas` with a pure-Python parser -> the same long triples schema
(s, p, o, g, vtype, lang) -> `infotons_from_rdf`. Files are the unit of
parallelism — a 100 TB ingest of many documents fans out one task per
file batch, Arrow-transferred, with no driver involvement.

Each parser covers the subset the reference's integration fixtures use
(vcard_*.n3 / vcard_*.xml / JSON-LD posts, cmwell-it RDFTests):
  Turtle : @prefix/@base + PREFIX/BASE, prefixed names, 'a', literal
           @lang / ^^dtype, numeric+boolean shorthand, ';' and ','
           lists, blank nodes (labelled and [ ... ] property lists),
           long strings. Collections '( )' are rejected explicitly.
  JSON-LD: @context (term map, prefix defs, @vocab, {'@id','@type':'@id'}
           term defs), @id/@type/@graph, nested node objects, value
           objects {'@value','@language','@type'}, arrays, scalars.
  RDF/XML: rdf:Description and typed node elements, rdf:about/nodeID,
           property elements with rdf:resource / rdf:datatype / xml:lang,
           nested node elements.
"""

from __future__ import annotations

import itertools
import json
import re
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD = "http://www.w3.org/2001/XMLSchema#"

# xsd datatype local name -> engine vtype code (Infoton.scala:527-537)
_XSD_VTYPE = {
    "integer": "l",
    "int": "i",
    "long": "l",
    "float": "f",
    "double": "w",
    "decimal": "w",
    "boolean": "b",
    "date": "d",
    "dateTime": "d",
}

TRIPLE_COLS = ["s", "p", "o", "g", "vtype", "lang"]


def _vtype_of(dtype_iri: str | None) -> str:
    if not dtype_iri:
        return "s"
    local = re.search(r"[#/]([A-Za-z]+)$", dtype_iri)
    return _XSD_VTYPE.get(local.group(1) if local else "", "s")


class RdfParseError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Turtle
# ---------------------------------------------------------------------------

_TTL_TOKEN = re.compile(
    r"""\s*(?:
      (?P<comment>\#[^\n]*)
    | (?P<iri><[^>]*>)
    | (?P<lstr>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\")
    | (?P<str>"(?:[^"\\\n]|\\.)*")
    | (?P<lang>@[A-Za-z][A-Za-z0-9\-]*)
    | (?P<dtype>\^\^)
    | (?P<num>[+-]?(?:\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?))
    | (?P<bnode>_:[A-Za-z0-9_\-]+)
    | (?P<pname>[A-Za-z_][\w\-.]*)?:(?P<plocal>[\w\-.:%/#]*)
    | (?P<kw>[A-Za-z_][\w\-]*)
    | (?P<punct>\.|;|,|\[|\]|\(|\)|\{|\})
    )""",
    re.VERBOSE,
)


def _ttl_tokens(text: str):
    i, n = 0, len(text)
    while i < n:
        m = _TTL_TOKEN.match(text, i)
        if not m:
            if text[i:].strip() == "":
                return
            raise RdfParseError(f"turtle lexical error at {text[i:i+30]!r}")
        i = m.end()
        if m.lastgroup == "comment":
            continue
        yield m


class _TurtleParser:
    def __init__(self, text: str, trig: bool = False):
        self.toks = list(_ttl_tokens(text))
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.base = ""
        self.bn = itertools.count()
        self.out: list[tuple] = []
        self.trig = trig
        self.graph: str | None = None  # current TriG graph label

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        if t is None:
            raise RdfParseError("unexpected end of turtle document")
        self.i += 1
        return t

    def _punct(self, ch: str) -> bool:
        t = self.peek()
        if t is not None and t.lastgroup == "punct" and t.group(0).strip() == ch:
            self.i += 1
            return True
        return False

    def parse(self) -> list[tuple]:
        while self.peek() is not None:
            t = self.peek()
            word = t.group(0).strip()
            if word == "@prefix" or (t.lastgroup == "kw" and word.upper() == "PREFIX"):
                self.next()
                self._prefix(directive=word.startswith("@"))
                continue
            if word == "@base" or (t.lastgroup == "kw" and word.upper() == "BASE"):
                self.next()
                iri_t = self.next()
                if iri_t.lastgroup != "iri":
                    raise RdfParseError("BASE needs an IRI")
                self.base = iri_t.group(0).strip()[1:-1]
                if word.startswith("@"):
                    if not self._punct("."):
                        raise RdfParseError("@base must end with '.'")
                continue
            if self.trig and self._graph_block():
                continue
            self._triples()
            if not self._punct("."):
                raise RdfParseError("statement must end with '.'")
        return self.out

    def _graph_block(self) -> bool:
        """TriG: `[GRAPH] <label>? { triples* }` — returns True if a block
        was consumed. A bare `{` opens the default graph."""
        save = self.i
        t = self.peek()
        word = t.group(0).strip()
        if t.lastgroup == "kw" and word.upper() == "GRAPH":
            self.next()
            t = self.peek()
            word = t.group(0).strip() if t else ""
        label: str | None = None
        if t is not None and (t.lastgroup in ("iri", "bnode") or t.group("plocal") is not None):
            lv, lk, _, _ = self._term(as_subject=True)
            label = lv
            t = self.peek()
        if t is None or not (t.lastgroup == "punct" and t.group(0).strip() == "{"):
            self.i = save  # not a graph block — plain triples statement
            return False
        self.next()
        self.graph = label
        while not self._punct("}"):
            if self.peek() is None:
                raise RdfParseError("unterminated graph block")
            self._triples()
            self._punct(".")  # '.' between triples is optional before '}'
        self.graph = None
        return True

    def _prefix(self, directive: bool):
        t = self.next()
        # "ex:" lexes via the pname branch with an empty plocal
        if t.group("plocal") is None or t.group("plocal") != "":
            raise RdfParseError(f"expected prefix name, got {t.group(0)!r}")
        pfx = t.group("pname") or ""
        iri_t = self.next()
        if iri_t.lastgroup != "iri":
            raise RdfParseError("prefix needs an IRI")
        self.prefixes[pfx] = iri_t.group(0).strip()[1:-1]
        if directive and not self._punct("."):
            raise RdfParseError("@prefix must end with '.'")

    def _resolve(self, iri: str) -> str:
        if re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", iri):
            return iri
        return self.base + iri

    def _term(self, as_subject: bool = False):
        """-> (value, kind, vtype, lang); kind in iri|bnode|lit"""
        t = self.next()
        g = t.lastgroup
        word = t.group(0).strip()
        if g == "iri":
            return self._resolve(word[1:-1]), "iri", "s", None
        if g == "bnode":
            return word, "bnode", "s", None
        if t.group("plocal") is not None:  # prefixed name (pfx:local or :local)
            pfx = t.group("pname") or ""
            if pfx not in self.prefixes:
                raise RdfParseError(f"unknown turtle prefix {pfx!r}")
            return self.prefixes[pfx] + t.group("plocal"), "iri", "s", None
        if g == "kw":
            if word == "a" and not as_subject:
                return RDF_TYPE, "iri", "s", None
            if word in ("true", "false"):
                return word, "lit", "b", None
            raise RdfParseError(f"unexpected token {word!r}")
        if g == "num":
            vt = "w" if any(c in word for c in ".eE") else "l"
            return word, "lit", vt, None
        if g in ("str", "lstr"):
            body = word[3:-3] if g == "lstr" else word[1:-1]
            body = body.encode().decode("unicode_escape")
            nxt = self.peek()
            if nxt is not None and nxt.lastgroup == "lang":
                self.next()
                return body, "lit", "s", nxt.group(0).strip()[1:]
            if nxt is not None and nxt.lastgroup == "dtype":
                self.next()
                dt = self._term()
                if dt[1] != "iri":
                    raise RdfParseError("^^ needs an IRI datatype")
                return body, "lit", _vtype_of(dt[0]), None
            return body, "lit", "s", None
        if g == "punct" and word == "[":
            self.i -= 1
            return self._bnode_property_list(), "bnode", "s", None
        if g == "punct" and word == "(":
            raise RdfParseError("turtle collections '( )' are not supported")
        raise RdfParseError(f"unexpected token {word!r}")

    def _bnode_property_list(self) -> str:
        if not self._punct("["):
            raise RdfParseError("expected '['")
        node = f"_:ttlb{next(self.bn)}"
        if not self._punct("]"):
            self._predicate_object_list(node)
            if not self._punct("]"):
                raise RdfParseError("unterminated '[' property list")
        return node

    def _triples(self):
        t = self.peek()
        if t.lastgroup == "punct" and t.group(0).strip() == "[":
            subj = self._bnode_property_list()
            # optional trailing predicate list after [ ... ]
            nxt = self.peek()
            if nxt is not None and not (nxt.lastgroup == "punct" and nxt.group(0).strip() == "."):
                self._predicate_object_list(subj)
            return
        sv, sk, _, _ = self._term(as_subject=True)
        if sk == "lit":
            raise RdfParseError("literal cannot be a subject")
        self._predicate_object_list(sv)

    def _predicate_object_list(self, subj: str):
        while True:
            pv, pk, _, _ = self._term()
            if pk != "iri":
                raise RdfParseError("predicate must be an IRI")
            while True:
                ov, ok, vt, lang = self._term()
                self.out.append((subj, pv, ov, self.graph, vt if ok == "lit" else "s", lang))
                if not self._punct(","):
                    break
            if self._punct(";"):
                nxt = self.peek()
                if nxt is None or (nxt.lastgroup == "punct" and nxt.group(0).strip() in (".", "]")):
                    return
                continue
            return


def turtle_to_triples(text: str) -> list[tuple]:
    return _TurtleParser(text).parse()


def trig_to_triples(text: str) -> list[tuple]:
    """TriG = Turtle + named-graph blocks; quads carry the graph label."""
    return _TurtleParser(text, trig=True).parse()


# ---------------------------------------------------------------------------
# JSON-LD
# ---------------------------------------------------------------------------


def jsonld_to_triples(text: str) -> list[tuple]:
    doc = json.loads(text)
    out: list[tuple] = []
    bn = itertools.count()

    ctx_raw = doc.get("@context", {}) if isinstance(doc, dict) else {}
    vocab = ctx_raw.get("@vocab", "")
    terms: dict[str, dict] = {}
    for k, v in ctx_raw.items():
        if k.startswith("@"):
            continue
        if isinstance(v, str):
            terms[k] = {"@id": v}
        elif isinstance(v, dict):
            terms[k] = v

    def expand(name: str) -> str:
        if name in terms:
            return expand_iri(terms[name]["@id"])
        return expand_iri(name)

    def expand_iri(iri: str) -> str:
        if ":" in iri:
            pfx, local = iri.split(":", 1)
            if pfx in terms and not local.startswith("//"):
                return terms[pfx]["@id"] + local
            return iri
        return vocab + iri if vocab else iri

    def is_id_term(name: str) -> bool:
        return terms.get(name, {}).get("@type") == "@id"

    def node(obj: dict, graph: str | None) -> str:
        nid = obj.get("@id") or f"_:jb{next(bn)}"
        nid = expand_iri(nid) if not nid.startswith("_:") else nid
        types = obj.get("@type", [])
        for t in types if isinstance(types, list) else [types]:
            out.append((nid, RDF_TYPE, expand_iri(t), graph, "s", None))
        for k, v in obj.items():
            if k.startswith("@"):
                continue
            pred = expand(k)
            for item in v if isinstance(v, list) else [v]:
                if isinstance(item, dict):
                    if "@value" in item:
                        val = item["@value"]
                        lang = item.get("@language")
                        dtype = item.get("@type")
                        vt = _vtype_of(expand_iri(dtype)) if dtype else _scalar_vtype(val)
                        out.append((nid, pred, _lex(val), graph, vt, lang))
                    else:
                        out.append((nid, pred, node(item, graph), graph, "s", None))
                elif isinstance(item, bool):
                    out.append((nid, pred, "true" if item else "false", graph, "b", None))
                elif isinstance(item, (int, float)):
                    vt = "l" if isinstance(item, int) else "w"
                    out.append((nid, pred, _lex(item), graph, vt, None))
                elif is_id_term(k):
                    out.append((nid, pred, expand_iri(str(item)), graph, "s", None))
                else:
                    out.append((nid, pred, str(item), graph, "s", None))
        return nid

    def _scalar_vtype(v) -> str:
        if isinstance(v, bool):
            return "b"
        if isinstance(v, int):
            return "l"
        if isinstance(v, float):
            return "w"
        return "s"

    def _lex(v) -> str:
        if isinstance(v, bool):
            return "true" if v else "false"
        return str(v)

    def walk(x, graph: str | None):
        if isinstance(x, list):
            for item in x:
                walk(item, graph)
        elif isinstance(x, dict):
            if "@graph" in x:
                gname = x.get("@id")
                gname = expand_iri(gname) if gname else None
                walk(x["@graph"], gname)
            else:
                node(x, graph)

    walk(doc, None)
    return out


# ---------------------------------------------------------------------------
# RDF/XML
# ---------------------------------------------------------------------------

_RDF_NS = "{http://www.w3.org/1999/02/22-rdf-syntax-ns#}"
_XML_NS = "{http://www.w3.org/XML/1998/namespace}"


def rdfxml_to_triples(text: str) -> list[tuple]:
    root = ET.fromstring(text)
    out: list[tuple] = []
    bn = itertools.count()

    def split_tag(tag: str) -> str:
        m = re.match(r"\{([^}]*)\}(.*)", tag)
        return (m.group(1) + m.group(2)) if m else tag

    def node(el: ET.Element) -> str:
        about = el.get(_RDF_NS + "about")
        node_id = el.get(_RDF_NS + "nodeID")
        nid = about if about is not None else (f"_:{node_id}" if node_id else f"_:xb{next(bn)}")
        if el.tag != _RDF_NS + "Description":
            out.append((nid, RDF_TYPE, split_tag(el.tag), None, "s", None))
        for prop in el:
            pred = split_tag(prop.tag)
            res = prop.get(_RDF_NS + "resource")
            pnode = prop.get(_RDF_NS + "nodeID")
            dtype = prop.get(_RDF_NS + "datatype")
            lang = prop.get(_XML_NS + "lang")
            children = list(prop)
            if res is not None:
                out.append((nid, pred, res, None, "s", None))
            elif pnode is not None:
                out.append((nid, pred, f"_:{pnode}", None, "s", None))
            elif children:
                for child in children:
                    out.append((nid, pred, node(child), None, "s", None))
            else:
                out.append((nid, pred, prop.text or "", None, _vtype_of(dtype), lang))
        return nid

    for el in root if root.tag == _RDF_NS + "RDF" else [root]:
        node(el)
    return out


# ---------------------------------------------------------------------------
# TriX
# ---------------------------------------------------------------------------

_TRIX_NS = "{http://www.w3.org/2004/03/trix/trix-1/}"


def trix_to_triples(text: str) -> list[tuple]:
    """TriX (W3C note): <TriX><graph><uri>label?</uri><triple>s p o</triple>
    ...</graph></TriX>; terms are <uri>, <id> (bnode), <plainLiteral
    xml:lang?> or <typedLiteral datatype=...>."""
    root = ET.fromstring(text)
    if root.tag != _TRIX_NS + "TriX":
        raise RdfParseError(f"not a TriX document (root {root.tag!r})")
    out: list[tuple] = []

    def term(el: ET.Element):
        tag = el.tag.removeprefix(_TRIX_NS)
        txt = el.text or ""
        if tag == "uri":
            return txt, "s", None
        if tag == "id":
            return f"_:{txt}", "s", None
        if tag == "plainLiteral":
            return txt, "s", el.get(_XML_NS + "lang")
        if tag == "typedLiteral":
            return txt, _vtype_of(el.get("datatype")), None
        raise RdfParseError(f"unknown TriX term element {tag!r}")

    for graph in root:
        label = None
        for child in graph:
            tag = child.tag.removeprefix(_TRIX_NS)
            if tag == "uri":
                label = child.text  # graph label
                continue
            if tag != "triple":
                raise RdfParseError(f"unexpected TriX element {tag!r}")
            terms = list(child)
            if len(terms) != 3:
                raise RdfParseError("TriX triple needs exactly 3 terms")
            s, _, _ = term(terms[0])
            p, _, _ = term(terms[1])
            o, vt, lang = term(terms[2])
            out.append((s, p, o, label, vt, lang))
    return out


# ---------------------------------------------------------------------------
# Spark plumbing — one row per document, Arrow-batched parse
# ---------------------------------------------------------------------------

_PARSERS = {
    "ttl": turtle_to_triples,
    "turtle": turtle_to_triples,
    "n3": turtle_to_triples,  # the reference treats .n3 fixtures as Turtle
    "trig": trig_to_triples,
    "trix": trix_to_triples,
    "jsonld": jsonld_to_triples,
    "rdfxml": rdfxml_to_triples,
    "xml": rdfxml_to_triples,
}

TRIPLES_SCHEMA = "s string, p string, o string, g string, vtype string, lang string"


def parse_rdf_documents(docs: DataFrame, fmt: str, text_col: str = "value") -> DataFrame:
    """docs (one row per document) -> long triples. mapInPandas: the parse
    runs executor-side over Arrow batches; a malformed document raises
    with its parse error (fail-fast like the reference's 422 on bad RDF)."""
    import pandas as pd

    parser = _PARSERS.get(fmt)
    if parser is None:
        raise RdfParseError(f"unknown RDF format {fmt!r} (know: {sorted(_PARSERS)})")

    def gen(batches):
        for pdf in batches:
            rows: list[tuple] = []
            for txt in pdf[text_col]:
                rows.extend(parser(txt))
            yield pd.DataFrame(rows, columns=TRIPLE_COLS)

    return docs.mapInPandas(gen, TRIPLES_SCHEMA)


def read_rdf(spark: SparkSession, path: str, fmt: str) -> DataFrame:
    """Read Turtle/JSON-LD/RDF-XML files (one task unit per file — these
    formats are not line-splittable) into the long triples form."""
    return parse_rdf_documents(spark.read.text(path, wholetext=True), fmt)
