"""PII detection + redaction over document text (row-local, zero shuffle).

A web-scale training corpus must be scrubbed of personal identifiers
before export. Three detector classes, each a single regex pass:

- email:  ``[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}``
- phone:  ``\\+[0-9]{1,2}-[0-9]{2,4}-[0-9]{3,4}(-[0-9]{2,4})?`` (intl)
- ipv4:   ``([0-9]{1,3}\\.){3}[0-9]{1,3}`` with word boundaries

The patterns deliberately use only the regex subset with IDENTICAL
semantics in Java's engine (Spark executors) and RE2 (DuckDB oracle):
explicit classes, bounded repetition, ``\\b`` — no backrefs, no
lookaround, no engine-specific escapes. That is what makes the operator
value-oracle-checkable end to end.

Scale shape: Scan -> Project, ZERO Exchange (plan-asserted) — counts and
redaction are per-row string ops inside whole-stage codegen; nothing
about this operator moves text between executors. At 100 TB the cost is
the scan itself.

Redaction replaces every match with a class placeholder (``<EMAIL>``,
``<PHONE>``, ``<IP>``), longest-class-first so an email's host part is
not half-eaten by the IP rule when both could match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Java-regex and RE2 compatible (see module docstring). The email host
# alternates name-dot-TLD with a literal IPv4 — without the second arm
# an address like a@10.1.2.3 is invisible to the email rule and the IP
# rule then redacts only the host, leaking the username as "a@<IP>".
EMAIL_RE = (r"[A-Za-z0-9._%+-]+@([A-Za-z0-9.-]+\.[A-Za-z]{2,}"
            r"|[0-9]{1,3}(\.[0-9]{1,3}){3})")
PHONE_RE = r"\+[0-9]{1,2}-[0-9]{2,4}-[0-9]{3,4}(-[0-9]{2,4})?"
IPV4_RE = r"\b([0-9]{1,3}\.)([0-9]{1,3}\.)([0-9]{1,3})\.[0-9]{1,3}\b"

# email first: with the IP-host arm above, a@10.1.2.3 redacts as one
# <EMAIL> before the IP rule can half-eat it
_CLASSES = [("email", EMAIL_RE, "<EMAIL>"),
            ("phone", PHONE_RE, "<PHONE>"),
            ("ipv4", IPV4_RE, "<IP>")]


def with_pii_signals(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``n_email / n_phone / n_ipv4 / pii_free`` per document."""
    out = docs
    for name, pat, _ in _CLASSES:
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
            .cast("int"))
    total = sum(F.col(f"n_{name}") for name, _, _ in _CLASSES)
    return out.withColumn("pii_free", total == 0)


def redact(docs: DataFrame, text_col: str = "text",
           out_col: str = "text_redacted") -> DataFrame:
    """Replace every PII match with its class placeholder."""
    expr = F.col(text_col)
    for _, pat, repl in _CLASSES:
        expr = F.regexp_replace(expr, pat, repl)
    return docs.withColumn(out_col, expr)


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id, per-class counts, pii_free, and the redacted text —
    the one-pass export form (signals + scrub in a single projection)."""
    return redact(with_pii_signals(docs, text_col), text_col) \
        .select("doc_id", "n_email", "n_phone", "n_ipv4", "pii_free",
                "text_redacted")
