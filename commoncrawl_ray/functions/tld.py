"""TLD / root-domain extraction over public-suffix rules.

Reimplements the semantics of the reference's
``util/shared/URLUtils.java:41-208`` (``extractTLDName`` /
``extractRootDomainName``) + ``util/shared/TLDNamesCollection.java:24-77``
(rule parsing: each public-suffix rule line is split at its LAST dot into
``map[last_label] += rest`` with ``""`` for single-label rules, so
``*.ck`` becomes ``map["ck"] += "*"`` and ``!www.ck`` becomes
``map["ck"] += "!www"``).

The rule table is the FULL Public Suffix List shipped as package data
(``commoncrawl_ray/data/effective_tld_list.txt`` — the same
MPL-licensed public dataset the reference ships as
``conf/effective_tld_list.txt``; license block retained in the file).
Parsing mirrors ``TLDNamesCollection.initialize``: skip ``//`` and
blank lines, split each rule at its LAST dot. A small curated fallback
table below keeps the module importable if the package data file is
ever missing. The map is a module-level read-only singleton
(reference's lazy static multimap), safe to share across Ray
map_batches tasks (SURVEY §2.3 T1).
"""

from __future__ import annotations

import os
import re
from functools import lru_cache

_PSL_PATH = os.path.join(os.path.dirname(os.path.dirname(__file__)), "data", "effective_tld_list.txt")

# Curated fallback rules (PSL line format), used only if the package
# data file is absent; covers every shape the algorithm branches on.
_RULES = """
com
org
net
edu
gov
mil
int
info
biz
name
mobi
io
co
me
tv
us
ca
de
fr
it
nl
es
se
ch
at
be
pl
cz
eu
ru
com.ru
net.ru
org.ru
cn
com.cn
net.cn
org.cn
gov.cn
edu.cn
jp
ac.jp
co.jp
go.jp
or.jp
ne.jp
*.tokyo.jp
*.yokohama.jp
!metro.tokyo.jp
!city.yokohama.jp
uk
co.uk
org.uk
me.uk
ac.uk
gov.uk
net.uk
sch.uk
au
com.au
net.au
org.au
edu.au
gov.au
asn.au
id.au
nz
co.nz
net.nz
org.nz
govt.nz
ac.nz
br
com.br
net.br
org.br
gov.br
in
co.in
net.in
org.in
gov.in
ac.in
kr
co.kr
or.kr
ne.kr
go.kr
ac.kr
ck
*.ck
!www.ck
"""


def _build_map() -> dict[str, frozenset[str]]:
    try:
        with open(_PSL_PATH, encoding="utf-8") as f:
            text = f.read()
    except OSError:
        text = _RULES
    out: dict[str, set[str]] = {}
    for line in text.splitlines():
        if line.startswith("//"):
            continue
        line = line.strip()
        if not line:
            continue
        dot = line.rfind(".")
        if dot == -1:
            out.setdefault(line, set()).add("")
        else:
            out.setdefault(line[dot + 1 :].strip(), set()).add(line[:dot].strip())
    return {k: frozenset(v) for k, v in out.items()}


_TLD_MAP = _build_map()
_EMPTY: frozenset[str] = frozenset()

_INVALID_DOMAIN_CHARS = re.compile(r"[^0-9a-z\-\._]")
_IP_ADDRESS = re.compile(r"^[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+$")


def secondary_names(tld: str) -> frozenset[str]:
    """TLDNamesCollection.getSecondaryNames."""
    return _TLD_MAP.get(tld, _EMPTY)


def _root_name(host: str, parts: list[str], root_index: int) -> str:
    """URLUtils.buildRootNameString (``URLUtils.java:21-33``): suffix of
    ``host`` made of ``parts[root_index:]`` joined by dots."""
    n = sum(len(p) for p in parts[root_index:]) + (len(parts) - root_index - 1)
    return host[len(host) - n :]


@lru_cache(maxsize=65536)
def extract_root_domain(host: str) -> str | None:
    """URLUtils.extractRootDomainName (``URLUtils.java:129-208``).

    Returns the registrable domain (public suffix + one label) or None
    for invalid/unknown hosts. IPv4 literals return themselves.
    """
    if _IP_ADDRESS.match(host):
        return host
    if host.endswith("."):
        host = host[:-1]
    if host.startswith("*") and len(host) > 1:
        host = host[1:]
    if not host or _INVALID_DOMAIN_CHARS.search(host):
        return None
    parts = host.split(".")
    if len(parts) < 2:
        return None
    names = secondary_names(parts[-1])
    if not names:
        return None
    if parts[-2] in names or "*" in names:
        if ("!" + parts[-2]) in names:
            # exception: second-to-last label is NOT part of the suffix
            return _root_name(host, parts, len(parts) - 2)
        if len(parts) >= 3:
            return _root_name(host, parts, len(parts) - 3)
        return None
    extended_wildcard = "*." + parts[-2]
    if extended_wildcard in names:
        if len(parts) >= 3:
            if ("!" + parts[-3] + "." + parts[-2]) in names:
                return _root_name(host, parts, len(parts) - 3)
            if len(parts) >= 4:
                return _root_name(host, parts, len(parts) - 4)
        return None
    if "" in names:
        return _root_name(host, parts, len(parts) - 2)
    return None


@lru_cache(maxsize=65536)
def extract_tld(host: str) -> str | None:
    """URLUtils.extractTLDName (``URLUtils.java:41-118``)."""
    if _IP_ADDRESS.match(host):
        return "inaddr-arpa.arpa"
    if host.endswith("."):
        host = host[:-1]
    if host.startswith("*") and len(host) > 1:
        host = host[1:]
    if not host or _INVALID_DOMAIN_CHARS.search(host):
        return None
    parts = host.split(".")
    if len(parts) < 2:
        return None
    names = secondary_names(parts[-1])
    if not names:
        return None
    if parts[-2] in names or "*" in names:
        if ("!" + parts[-2]) in names:
            return _root_name(host, parts, len(parts) - 1)
        return _root_name(host, parts, len(parts) - 2)
    extended_wildcard = "*." + parts[-2]
    if extended_wildcard in names:
        if len(parts) >= 3:
            if ("!" + parts[-3] + "." + parts[-2]) in names:
                return _root_name(host, parts, len(parts) - 2)
            if len(parts) >= 4:
                return _root_name(host, parts, len(parts) - 3)
        return None
    if "" in names:
        return _root_name(host, parts, len(parts) - 1)
    return None
