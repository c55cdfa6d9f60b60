"""Transcendental-rounding margin audit (VERDICT r14 task #2).

Every oracled site of the form ``round(f(x), k)`` where ``f`` involves a
libm transcendental (ln, exp) carries a knife edge: the JVM's and
DuckDB's libm may differ by 1 ulp, so when the TRUE value sits within
~1 ulp of a ``.5e-k`` rounding boundary the engines can round apart
(the r14 ``dsir_weights`` red). This tool measures, for each such site,
the distance of every rounded value to its nearest boundary, computed
in 60-digit decimal arithmetic from the site's exact integer/decimal
inputs (pulled from DuckDB over the same parquet the driver uses).

Two margin kinds:

- **T (transcendental)**: the engines may produce doubles 1 ulp apart.
  Risk iff margin < ~2.3e-16 · |value| (relative ulp) — these sites
  need the portable-ln fix (``functions/portable_math``).
- **R (rational double)**: both engines compute the SAME double
  (exactly-rounded ops only); divergence can only come from the
  engines' different round() implementations (Spark shortest-repr
  BigDecimal vs DuckDB exact binary), which disagree only when the
  exact binary value sits within ~1e-17 relative of the boundary.

Usage::

    python audit_margins.py [sf_dir ...]   # default sf0.01 + sf0.1

Writes MARGINS.json and prints a per-site table. Sites mirror the
oracle CTE shapes in dbqt_spark/queries.py (line refs inline).
"""

from __future__ import annotations

import json
import sys
from decimal import Decimal, getcontext

import duckdb

getcontext().prec = 60

TOK = (
    "list_filter(string_split_regex(lower(coalesce(text, '')), '\\s+'),"
    " x -> x <> '')"
)


def margin_of(value: Decimal, k: int) -> float:
    """Distance of |value| to the nearest .5*10^-k rounding boundary,
    in value units."""
    d = abs(value) * (Decimal(10) ** k)
    f = d - int(d)
    return float(abs(f - Decimal("0.5"))) / 10**k


def _min_margin(values, k):
    worst = None
    for label, v in values:
        m = margin_of(v, k)
        if worst is None or m < worst[0]:
            worst = (m, label, float(v))
    return worst or (float("inf"), None, None)


def _hp_ln_ratio(num: int, den: int) -> Decimal:
    return (Decimal(num) / Decimal(den)).ln()


def audit(sf_dir: str) -> dict:
    con = duckdb.connect()
    for t in ("documents", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    out = {}

    # ---- lm_score (queries.py SQL_LM_SCORE): ln((c+1)/(t+v)) @6 [T],
    # per-doc perplexity exp(-avg6/1e6) @4 [T] ----
    rows = con.execute(f"""
        WITH toks AS (SELECT doc_id, unnest({TOK}) AS term FROM documents),
        doc_terms AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                      FROM toks GROUP BY 1, 2),
        vocab AS (SELECT term, CAST(sum(tf) AS BIGINT) AS c
                  FROM doc_terms GROUP BY 1),
        tot AS (SELECT CAST(sum(c) AS BIGINT) AS t,
                       CAST(count(*) AS BIGINT) AS v FROM vocab)
        SELECT DISTINCT c, t, v FROM vocab, tot
    """).fetchall()
    tv = rows[0][1] + rows[0][2] if rows else 1
    vals = [(f"c={c}", _hp_ln_ratio(c + 1, t + v)) for c, t, v in rows]
    vals.append(("floor", _hp_ln_ratio(1, tv)))
    out["lm_score.lp@6"] = ("T", *_min_margin(vals, 6))

    pp = con.execute(f"""
        WITH toks AS (SELECT doc_id, unnest({TOK}) AS term FROM documents),
        doc_terms AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                      FROM toks GROUP BY 1, 2),
        vocab AS (SELECT term, CAST(sum(tf) AS BIGINT) AS c
                  FROM doc_terms GROUP BY 1),
        tot AS (SELECT CAST(sum(c) AS BIGINT) AS t,
                       CAST(count(*) AS BIGINT) AS v FROM vocab),
        lp AS (SELECT term, CAST(round(ln(CAST(c + 1 AS DOUBLE)
                     / CAST(t + v AS DOUBLE)), 6) AS DECIMAL(18,6)) AS lp
               FROM vocab, tot)
        SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n,
               sum(CAST(tf AS DECIMAL(18,0)) * lp) AS s
        FROM doc_terms JOIN lp USING (term) GROUP BY doc_id
    """).fetchall()
    vals = []
    for doc_id, n, s in pp:
        if not n:
            continue
        smic = int(-s * 1_000_000) if s < 0 else int(s * 1_000_000)
        avg6 = (2 * smic + n) // (2 * n)
        if s < 0:
            avg6 = -avg6
        vals.append((f"doc={doc_id}", (-Decimal(avg6) / 1_000_000).exp()))
    out["lm_score.perplexity@4"] = ("T", *_min_margin(vals, 4))

    # ---- lm_score_bigram (SQL_LM_SCORE_BIGRAM): ln((c+1)/(cp+v)) @6 ----
    rows = con.execute(f"""
        WITH toks AS (SELECT doc_id, {TOK} AS ts FROM documents),
        bi AS (SELECT doc_id, unnest(CASE WHEN len(ts) < 2 THEN []
                 ELSE list_transform(range(2, len(ts) + 1),
                      i -> struct_pack(p := ts[i-1], t := ts[i])) END) AS g
               FROM toks),
        doc_bi AS (SELECT doc_id, g.p AS p, g.t AS t, count(*) AS tf
                   FROM bi GROUP BY 1, 2, 3),
        bv AS (SELECT p, t, CAST(sum(tf) AS BIGINT) AS c
               FROM doc_bi GROUP BY 1, 2),
        pt AS (SELECT p, CAST(sum(c) AS BIGINT) AS cp FROM bv GROUP BY 1),
        v AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS vv FROM bv)
        SELECT DISTINCT c, cp, vv FROM bv JOIN pt USING (p), v
    """).fetchall()
    vals = [
        (f"c={c},cp={cp}", _hp_ln_ratio(c + 1, cp + vv))
        for c, cp, vv in rows
    ]
    out["lm_score_bigram.lp@6"] = ("T", *_min_margin(vals, 6))

    # ---- tfidf_keywords (SQL_TFIDF_KEYWORDS): tf*ln(n/df) @6 [T] ----
    rows = con.execute(f"""
        WITH toks AS (SELECT doc_id, unnest({TOK}) AS term FROM documents),
        terms AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                  FROM toks WHERE length(term) >= 3 GROUP BY 1, 2),
        dfreq AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
                  FROM terms GROUP BY 1),
        n AS (SELECT count(*) AS n_docs FROM documents)
        SELECT DISTINCT t.tf, d.df, n.n_docs
        FROM terms t JOIN dfreq d USING (term), n
    """).fetchall()
    vals = [
        (f"tf={tf},df={df}", tf * _hp_ln_ratio(n, df))
        for tf, df, n in rows
    ]
    out["tfidf_keywords.tfidf@6"] = ("T", *_min_margin(vals, 6))

    # ---- bm25_search (SQL_BM25_SEARCH): contrib @7 [T], score @4 [R] ----
    rows = con.execute(f"""
        WITH toks AS (SELECT doc_id, unnest(list_filter(
               string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS t
               FROM documents),
        dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
               FROM toks GROUP BY 1),
        corpus AS (SELECT (SELECT count(*) FROM documents) AS n,
                   (SELECT CAST(sum(len(list_filter(string_split_regex(
                      lower(text), '\\s+'), x -> x <> ''))) AS BIGINT)
                    FROM documents) AS tot),
        tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf FROM toks
               WHERE t IN ('data', 'spark', 'window') GROUP BY 1, 2),
        dfreq AS (SELECT t, CAST(count(*) AS BIGINT) AS df
                  FROM tf GROUP BY 1)
        SELECT tf.doc_id, tf.tf, f.df, d.dl, c.n, c.tot
        FROM tf JOIN dfreq f USING (t) JOIN dl d ON d.doc_id = tf.doc_id,
             corpus c
    """).fetchall()
    vals, per_doc = [], {}
    for doc_id, tf, df, dl, n, tot in rows:
        idf = (Decimal(1) + (Decimal(n) - df + Decimal("0.5"))
               / (Decimal(df) + Decimal("0.5"))).ln()
        c = (idf * (Decimal(tf) * Decimal("2.2"))
             / (Decimal(tf) + Decimal("1.2")
                * (Decimal("0.25") + Decimal("0.75") * dl
                   / (Decimal(tot) / n))))
        vals.append((f"doc={doc_id}", c))
        rounded = c.quantize(Decimal("0.0000001"))
        per_doc[doc_id] = per_doc.get(doc_id, Decimal(0)) + rounded
    out["bm25_search.contrib@7"] = ("T", *_min_margin(vals, 7))
    # NOTE: this site's margin is legitimately 0 — contrib sums are
    # 1e-7-quantized decimals and DO land exactly on .5e-4 boundaries
    # (found live at sf0.01 doc=5 and sf0.1 doc=3644). Fixed in r15 by
    # rounding the exact DECIMAL before the double cast
    # (textstats.bm25_search / SQL_BM25_SEARCH) — exact half-away
    # rounding on both engines, so a 0 margin is now safe ("Rx").
    out["bm25_search.score@4 (decimal-exact since r15)"] = (
        "Rx", *_min_margin(list(per_doc.items()), 4)
    )

    # ---- char_entropy (SQL_CHAR_ENTROPY): k*ln(k) @6, ln(n)-s/n @4 ----
    rows = con.execute("""
        WITH ch AS (SELECT doc_id, unnest(string_split(
                      coalesce(text, ''), '')) AS c FROM documents),
        cnt AS (SELECT doc_id, c, CAST(count(*) AS BIGINT) AS k
                FROM ch WHERE c <> '' GROUP BY 1, 2)
        SELECT DISTINCT k FROM cnt
    """).fetchall()
    vals = [(f"k={k}", Decimal(k) * Decimal(k).ln()) for (k,) in rows]
    out["char_entropy.klnk@6"] = ("T", *_min_margin(vals, 6))
    rows = con.execute("""
        WITH ch AS (SELECT doc_id, unnest(string_split(
                      coalesce(text, ''), '')) AS c FROM documents),
        cnt AS (SELECT doc_id, c, CAST(count(*) AS BIGINT) AS k
                FROM ch WHERE c <> '' GROUP BY 1, 2)
        SELECT doc_id, CAST(sum(k) AS BIGINT) AS n,
               sum(CAST(round(k * ln(k), 6) AS DECIMAL(28,6))) AS s
        FROM cnt GROUP BY doc_id
    """).fetchall()
    vals = [
        (f"doc={d}", Decimal(n).ln() - Decimal(s) / n)
        for d, n, s in rows if n
    ]
    out["char_entropy.entropy@4"] = ("T", *_min_margin(vals, 4))

    # ---- psi_drift (SQL_PSI_DRIFT): (p-q)*ln(p/q) @6 [T],
    # p-q @6 [R] — p/q replayed as the engines' exact doubles ----
    rows = con.execute("""
        WITH bounds AS (SELECT CAST(MIN(l_extendedprice) AS DOUBLE) AS lo,
                  CAST(MAX(l_extendedprice) AS DOUBLE) AS hi
                FROM lineitem WHERE l_extendedprice IS NOT NULL),
        src AS (SELECT CASE WHEN hi > lo THEN LEAST(9, GREATEST(0,
                  CAST(FLOOR((CAST(l_extendedprice AS DOUBLE) - lo)
                       / ((hi - lo) / 10)) AS INT))) ELSE 0 END AS b,
                  count(*) AS n
                FROM lineitem, bounds WHERE l_extendedprice IS NOT NULL
                GROUP BY 1),
        tgt AS (SELECT CASE WHEN hi > lo THEN LEAST(9, GREATEST(0,
                  CAST(FLOOR((CAST(l_extendedprice AS DOUBLE) - lo)
                       / ((hi - lo) / 10)) AS INT))) ELSE 0 END AS b,
                  count(*) AS n
                FROM lineitem, bounds WHERE l_extendedprice IS NOT NULL
                  AND l_shipdate >= TIMESTAMP '1995-06-01' GROUP BY 1)
        SELECT r.range AS b, COALESCE(s.n, 0), COALESCE(t.n, 0)
        FROM range(10) r LEFT JOIN src s ON s.b = r.range
        LEFT JOIN tgt t ON t.b = r.range ORDER BY 1
    """).fetchall()
    stot = sum(r[1] for r in rows)
    ttot = sum(r[2] for r in rows)
    vals_t, vals_r = [], []
    for b, sn, tn in rows:
        p = max(sn / stot, 1e-6)  # the engines' double computation
        q = max(tn / ttot, 1e-6)
        diff = Decimal(p - q)
        vals_r.append((f"bin={b}", diff))
        if p != q:
            vals_t.append((f"bin={b}", diff * Decimal(p / q).ln()))
    out["psi_drift.psi_contrib@6"] = ("T", *_min_margin(vals_t, 6))
    out["psi_drift.frac_diff@6"] = ("R", *_min_margin(vals_r, 6))

    # ---- nb_classify / calibration (SQL_NB_CLASSIFY): model lns @6 ----
    rows = con.execute(f"""
        WITH train AS (SELECT CASE WHEN length(source) = 4 THEN 'short'
                  ELSE 'long' END AS label, text
                FROM documents WHERE doc_id % 2 = 0),
        ttok AS (SELECT label, unnest({TOK}) AS term FROM train),
        ct AS (SELECT label, term, CAST(count(*) AS BIGINT) AS n
               FROM ttok GROUP BY 1, 2),
        tot AS (SELECT label, CAST(sum(n) AS BIGINT) AS N
                FROM ct GROUP BY 1),
        voc AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS V FROM ct)
        SELECT DISTINCT ct.n, tot.N, voc.V
        FROM ct JOIN tot USING (label), voc
    """).fetchall()
    vals = [
        (f"n={n},N={N}", _hp_ln_ratio(n + 1, N + V)) for n, N, V in rows
    ]
    for _, N, V in {(0, N, V) for _, N, V in rows}:
        vals.append((f"floor N={N}", _hp_ln_ratio(1, N + V)))
    pri = con.execute("""
        WITH train AS (SELECT CASE WHEN length(source) = 4 THEN 'short'
                  ELSE 'long' END AS label FROM documents
                WHERE doc_id % 2 = 0)
        SELECT label, count(*) AS d, (SELECT count(*) FROM train) AS D
        FROM train GROUP BY 1
    """).fetchall()
    vals += [(f"prior {lab}", _hp_ln_ratio(d, D)) for lab, d, D in pri]
    out["nb_classify.model@6"] = ("T", *_min_margin(vals, 6))

    # ---- classifier_score / calibration_report: sigmoid @6 [T].
    # x = -0.2 + s/n replayed as the engines' exact doubles from the
    # oracle's DECIMAL(20,8) weight sum (SQL_CLASSIFIER_SCORE) ----
    from dbqt_spark.queries import _CLS_WEIGHTS

    wvals = ", ".join(
        f"('{t}', {round(v, 6)})" for t, v in sorted(_CLS_WEIGHTS.items())
    )
    sig = con.execute(f"""
        WITH w(tok, wt) AS (VALUES {wvals}),
        t AS (SELECT doc_id, unnest({TOK}) AS tok FROM documents),
        agg AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n,
                  sum(CAST(coalesce(w.wt, 0) AS DECIMAL(20,8))) AS s
                FROM t LEFT JOIN w ON t.tok = w.tok GROUP BY t.doc_id)
        SELECT doc_id, n, s FROM agg WHERE n > 0
    """).fetchall()
    vals = []
    for doc_id, n, s in sig:
        x = -0.2 + float(s) / n  # the engines' double value
        vals.append(
            (f"doc={doc_id}",
             Decimal(1) / (Decimal(1) + Decimal(-x).exp()))
        )
    out["classifier.sigmoid@6"] = ("T", *_min_margin(vals, 6))

    # ---- the r14 offender, pre-fix shape, for the record:
    # dsir round(ln((t+1)(R+B)/((r+1)(T+B))), 6) over 10k buckets ----
    rows = con.execute(f"""
        WITH rawd AS (SELECT doc_id, coalesce(text, '') AS text
                      FROM documents),
        tgtd AS (SELECT doc_id, coalesce(text, '') AS text
                 FROM documents WHERE doc_id % 7 = 0),
        rtoks AS (SELECT doc_id, {TOK} AS toks FROM rawd),
        ttoks AS (SELECT doc_id, {TOK} AS toks FROM tgtd),
        rgrams AS (SELECT doc_id, unnest(list_concat(toks,
            CASE WHEN len(toks) >= 2 THEN list_transform(
              range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
            ELSE [] END)) AS gram FROM rtoks),
        tgrams AS (SELECT doc_id, unnest(list_concat(toks,
            CASE WHEN len(toks) >= 2 THEN list_transform(
              range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
            ELSE [] END)) AS gram FROM ttoks),
        rfeat AS (SELECT ('0x' || substr(md5(gram), 1, 15))::UBIGINT
                    % 10000 AS bucket, count(*) AS cnt FROM rgrams
                  GROUP BY 1),
        tfeat AS (SELECT ('0x' || substr(md5(gram), 1, 15))::UBIGINT
                    % 10000 AS bucket, count(*) AS cnt FROM tgrams
                  GROUP BY 1),
        marg AS (SELECT coalesce(t.bucket, r.bucket) AS bucket,
                   CAST(coalesce(t.cnt, 0) AS BIGINT) AS tc,
                   CAST(coalesce(r.cnt, 0) AS BIGINT) AS rc
                 FROM tfeat t FULL OUTER JOIN rfeat r USING (bucket)),
        tot AS (SELECT CAST(sum(tc) AS BIGINT) AS tt,
                       CAST(sum(rc) AS BIGINT) AS tr FROM marg)
        SELECT bucket, tc, rc, tt, tr FROM marg, tot
    """).fetchall()
    vals = [
        (
            f"bucket={b}",
            _hp_ln_ratio((tc + 1) * (tr + 10000), (rc + 1) * (tt + 10000)),
        )
        for b, tc, rc, tt, tr in rows
    ]
    out["dsir.lr6@6 (pre-fix shape, now portable)"] = (
        "T", *_min_margin(vals, 6)
    )

    # ---- r16 build-segment sweep (VERDICT r15 #10): the 21 queries the
    # segment added are integer/string-exact by construction EXCEPT
    # pagerank_dangling (integer-pico contract with round() on shared
    # rational doubles at every iteration site — R kind: both engines
    # compute the SAME IEEE double, so divergence needs the double
    # within ~1e-17 relative of a boundary) and recrawl_plan (an
    # integer-valued DOUBLE column — exactly representable, margin is
    # the full 0.5, recorded as Rx). bpe/unigram/bloom/cdx/wet/c4/
    # sitemap/redirect/blocklist oracles contain no ln/exp/round/DOUBLE
    # arithmetic at all (scanned mechanically; strings and BIGINTs
    # end-to-end). The dsir pair moved to BIGINT micro units in r16
    # (1f38dcf) — integer-exact like unigram_train, no float surface
    # left. pagerank_tol / host_pagerank share the same pico round
    # sites as the dangling arm (same operator), covered below.
    edges = con.execute("""
        WITH e AS (
          SELECT 'site-' || (doc_id % 7) || '.example' AS s,
                 'site-' || ((3 * doc_id + 1) % 11) || '.example' AS d
          FROM documents
          WHERE 'site-' || (doc_id % 7) || '.example'
                <> 'site-' || ((3 * doc_id + 1) % 11) || '.example'
        )
        SELECT s, d, CAST(count(*) AS BIGINT) FROM e GROUP BY 1, 2
    """).fetchall()
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    outw = {}
    for s, _, n in edges:
        outw[s] = outw.get(s, 0) + n
    n_nodes = float(len(nodes))
    vals = []

    def _r(label, x):
        """Margin-tracked round-to-integer of the engines' shared
        double ``x`` (Python float == IEEE double, same op order)."""
        vals.append((label, Decimal(x)))
        return int(Decimal(x).quantize(Decimal(1), rounding="ROUND_HALF_UP"))

    rank = {h: _r(f"r0 n={len(nodes)}", 1000000000000.0 / n_nodes)
            for h in nodes}
    for it in (1, 2):
        dang = sum(rank[h] for h in nodes if h not in outw)
        share = _r(f"d{it}", float(dang) / n_nodes)
        contrib = {}
        for s, d, n in edges:
            c = _r(f"c{it} {s}->{d}",
                   float(rank[s]) * float(n) / float(outw[s]))
            contrib[d] = contrib.get(d, 0) + c
        rank = {
            h: _r(f"r{it} {h}",
                  ((1.0 - 0.85) * 1000000000000.0) / n_nodes
                  + 0.85 * float(contrib.get(h, 0) + share))
            for h in nodes
        }
    out["pagerank_dangling.pico@0 (shared-double rounds)"] = (
        "R", *_min_margin(vals, 0)
    )
    waves = con.execute("""
        WITH base AS (
          SELECT doc_id,
            'https://site-' || (doc_id % 5) || '.example/p/' || doc_id
              AS url,
            'site-' || (doc_id % 5) || '.example' AS host
          FROM documents
        ),
        frontier AS (
          SELECT url,
            CASE WHEN doc_id % 10 = 1 THEN 3 ELSE 1 END AS priority, host
          FROM base WHERE doc_id % 10 != 0
          UNION ALL
          SELECT url || '/alt', 2, host FROM base WHERE doc_id % 10 = 2
        )
        SELECT DISTINCT CAST(row_number() OVER (
          PARTITION BY host ORDER BY priority DESC, url ASC) AS BIGINT)
        FROM frontier
    """).fetchall()
    out["recrawl_plan.fetch_after_sec (integer-valued double)"] = (
        "Rx", *_min_margin([(f"wave={w}", Decimal(int(w) - 1)) for (w,) in waves], 0)
    )
    con.close()
    return out


def main(dirs):
    report = {}
    for sf_dir in dirs:
        print(f"== {sf_dir} ==")
        res = audit(sf_dir)
        report[sf_dir] = {
            site: {
                "kind": kind, "min_margin": m, "at": label, "value": v,
                "risky": kind != "Rx" and bool(
                    m < (2.3e-16 if kind == "T" else 1e-17)
                    * max(abs(v or 0.0), 1.0)
                ),
            }
            for site, (kind, m, label, v) in res.items()
        }
        for site, (kind, m, label, v) in sorted(res.items()):
            flag = (
                " <-- RISK"
                if kind != "Rx"
                and m < (2.3e-16 if kind == "T" else 1e-17)
                * max(abs(v or 0.0), 1.0)
                else ""
            )
            print(f"  [{kind}] {site:45s} min_margin={m:.3e} "
                  f"at {label} (value {v}){flag}")
    with open("MARGINS.json", "w") as f:
        json.dump(report, f, indent=1)
    print("wrote MARGINS.json")


if __name__ == "__main__":
    main(sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
