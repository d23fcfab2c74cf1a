"""Reference conformance: replay johnkerl/miller's own golden test
corpus through this engine (miller_ray.conformance harness). The
north-star goal — "matches the reference's results on its own test
inputs" — is asserted here: ZERO failures across the supported verb
suites; unsupported constructs are explicitly skipped and counted."""

import pytest

from miller_ray import conformance as C

SUITES = ["verb-count", "verb-count-distinct", "verb-uniq", "verb-cut",
          "verb-sort", "verb-top", "verb-histogram", "verb-fill-empty",
          "verb-rename", "verb-label", "verb-stats1", "verb-head", "verb-tail",
          "verb-cat", "verb-grep", "verb-having-fields", "verb-decimate",
          "verb-fraction", "verb-tac", "verb-seqgen", "verb-nothing",
          "verb-group-by", "verb-regularize", "verb-stats2",
          "verb-merge-fields", "verb-fill-down", "verb-sort-within-records",
          "verb-step",
          # round 2: record-shape verbs, regex variants, join, DSL
          "verb-reorder", "verb-repeat", "verb-template",
          "verb-sub-gsub-ssub", "verb-sec2gmt", "verb-case", "verb-nest",
          "verb-reshape", "verb-most-least-frequent", "verb-count-similar",
          "verb-sparsify", "verb-unsparsify", "verb-skip-trivial-records",
          "verb-remove-empty-columns", "verb-format-values", "verb-truncate",
          "verb-unspace", "verb-altkv", "verb-join", "verb-rename-regex",
          "verb-rename-no-regex", "verb-cut-regexed",
          "verb-int-float-stats1-step1",
          "dsl-filter", "dsl-basic", "dsl-comments",
          # round 2b: probe-verified suites + targeted fixes
          "chaining", "cli-csv-rs-environment-defaults",
          "dsl-absent-empty", "dsl-array-map-indexing",
          "dsl-clean-whitespace", "dsl-from-file",
          "dsl-json-collection-output", "dsl-multipart-scripts",
          "dsl-nested-double-quotes", "dsl-no-filter-in-filter",
          "dsl-parse", "dsl-regex", "dsl-regex-matching",
          "dsl-scientific-notation", "dsl-semicolons", "dsl-strlen",
          "dsl-subs", "dsl-toupper-tolower", "dsl-trailing-commas",
          "dsl-typed-overlay", "dsl-utf8-field-names",
          "dsl-utf8-uppercase-lowercase", "dsl-whitespace",
          "io-het-pprint-input", "io-jsonl-io",
          "io-lf-crlf-and-autodetect", "io-missing-final-lf",
          "io-multi-character-ixs", "io-utf8-alignment",
          "mix-number-formatting",
          "dsl-substr", "dsl-regex-captures", "dsl-truncate",
          "dsl-filter-pattern-action", "dsl-functional-tests",
          "io-json-io", "io-multi",
          "verb-stats1-percentile-interpolation",
          "verb-stats1-regexed-field-names",
          "dsl-sec2gmt", "dsl-gmt-date-time-functions",
          "dsl-number-formatting", "int64-io", "io-het-csv-input",
          "io-dedupe-field-names",
          # round 2c: if/elif/else + pattern-action blocks and fixes
          "dsl-empty", "dsl-modular-arithmetic", "dsl-if-chain",
          "dsl-length", "io-utf8-bom", "io-uri-schemes",
          "io-format-conversion-keystroke-savers",
          # round 3: locals/loops/UDFs/subroutines/HOFs/positional fields
          "dsl-argpass-typedecl", "dsl-block-exit", "dsl-break-continue",
          "dsl-do-while", "dsl-emit-het", "dsl-env", "dsl-for-map-depth",
          "dsl-for-one", "dsl-for-oosvar-loops", "dsl-for-two",
          "dsl-for-variants", "dsl-forbind-typedecl", "dsl-func-decl-hoist",
          "dsl-indexing", "dsl-local-map-variable-typedecl",
          "dsl-local-map-variable-write-read", "dsl-localvar-scope-and-extent",
          "dsl-localvar-typedecl", "dsl-mapvar-emit",
          "dsl-mapvars-udfs-subroutines", "dsl-min-max-types",
          "dsl-null-empty-handling", "dsl-put-dash-s", "dsl-scope",
          "dsl-stack-allocation", "dsl-string-array-indexing-slicing",
          "dsl-subr", "dsl-triple-for-loops", "dsl-typedecl",
          "dsl-user-defined-functions",
          # round 3b: dump/print/emit semantics, collections, map values
          "dsl-begin-end", "dsl-collection-equality", "dsl-concat",
          "dsl-dump-print", "dsl-emit", "dsl-emit1",
          "dsl-flatten-unflatten", "dsl-haskey",
          "dsl-indirect-srec-assignments", "dsl-lashed-emitp-singles",
          "dsl-length-depth-leafcount", "dsl-lhs-indexing",
          "dsl-localvar-unsets", "dsl-mapsum-mapdiff-mapexcept",
          "dsl-mapvar-assignments", "dsl-mathy", "dsl-oosvar-assignments",
          "dsl-oosvars", "dsl-output-redirects", "dsl-parameterized-emit",
          "dsl-print", "dsl-short-circuit", "dsl-sorts", "dsl-split-join",
          "dsl-type-inference", "dsl-type-reflect", "dsl-unset",
          "dsl-user-defined-functions-and-subroutines",
          "dsl-first-class-functions",
          # round 3c: void semantics, mixed-format join, emit indexing
          "mix-null-field-input", "verb-join-mixed-format", "globbing",
          "dsl-depth", "dsl-multi-index", "io-ixs-regex",
          "io-implicit-header-csv-input", "verb-flatten-unflatten",
          "dsl-prefixed-unprefixed-emit", "dsl-emit-basic-indexing",
          "io-compressed-input",
          # round 3d: format/unformat, scalar type predicates,
          # local-time family with per-case env files
          "dsl-format", "dsl-unformat", "dsl-type-predicates",
          "dsl-local-date-time-functions",
          # round 3e: mixed-type records via the record-dict path,
          # void/absent arithmetic dispositions, scalar typeof/strmatch
          "dsl-asserting", "dsl-context-specific-validation",
          "dsl-is-predicates", "dsl-map-funcs", "dsl-split-join-more",
          "dsl-for-bind-loops-for-valgrind", "dsl-more-type-predicates",
          "dsl-map-variant-dumps", "dsl-match", "dsl-extended-typeof",
          # round 3f: put/filter -v AST echo (dsl_ast module reproduces
          # the mlr.bnf-annotated tree format byte-for-byte)
          "dsl-operator-precedence", "dsl-operator-associativity",
          "dsl-if-chaining", "dsl-do-while-loops",
          "dsl-for-srec-loops", "dsl-for-multi", "dsl-max-variadic",
          "dsl-operator-rewrites", "dsl-empty-statements",
          # round 3g: main-flag wave — keystroke savers, separators,
          # comments, ragged/implicit csv, yaml/markdown io, --tz
          "io-skip-pass-comments", "io-rfc-csv", "io-spec-tsv",
          "io-yaml-io", "io-markdown", "io-pprint", "io-barred-pprint",
          "io-separator-aliases", "io-csv-ors-crlf",
          "cli-getoptish", "cli-mfrom", "dsl-context-validation",
          "dsl-json-parse-json-stringify", "dsl-pythonic-division",
          "verb-gap",
          # round 3h: output redirects (print/dump/emit/tee > file),
          # postcmp file verification, json-parse/stringify + flatten
          # verbs over nested JSON input
          "dsl-redirects", "verb-split",
          "verb-tee", "verb-json-parse-json-stringify",
          # round 3i: should-fail verification (partial output + error
          # confirmation), summary/describe/rank verbs
          "verb-summary", "verb-describe", "verb-rank",
          # round 4: probe-verified green suites
          "dsl-arrayify", "dsl-index", "dsl-leafcount",
          "dsl-line-number-column-number", "dsl-load",
          "dsl-mapvar-for-loops", "dsl-programming-examples",
          "dsl-put-multiple-dash-e", "dsl-utf8-strlen",
          "io-nr-progress-mod", "io-pprint-right-align-numeric",
          "io-ragged-implicit-header-csvlite", "io-ragged-non-rfc-csv",
          "verb-check", "verb-group-like",
          # round 4ii: int radix, pad whole-unit repeat, latin1<->utf8
          # BIFs+verbs, -O/-A infer flags, strict-writer unsparsify,
          # ragged TSV, end-block NR fidelity
          "dsl-int-function", "dsl-leftpad-rightpad", "dsl-latin1",
          "verb-latin1-to-utf8", "verb-utf8-to-latin1",
          "io-csv-auto-unsparsify", "io-tsv-auto-unsparsify",
          "io-infer-flags", "io-ragged-implicit-header-tsv",
          "verb-head-early-out",
          # round 4iii: new I/O formats (recutils, dcf, dkvpx, gen
          # pseudo-reader), --repifs, --ofmte/f/g, -I in-place with
          # precopy staging, .mlrrc profiles, default-verb cat
          "io-recutils", "io-dcf", "io-dkvpx", "io-gen",
          "io-space-padding", "io-in-place-processing",
          "cli-ofmt", "cli-default-verb-cat", "cli-mlrrc-profiles",
          "cli-norc",
          # round 4iv: slices, bare-@ oosvar indexing, map-dot access,
          # contains/index/stat BIFs, no-shell guards, mlr script,
          # Kaplan-Meier surv
          "dsl-slice", "dsl-contains", "dsl-indirect-oosvar-assignments",
          "dsl-map-dot", "dsl-mapvars-in-scalar-function-call-contexts",
          "dsl-stat", "dsl-stats", "non-windows", "no-shell", "script",
          "verb-surv",
          # round 4v: fixed-width pprint input, byte-level aux tools,
          # presentation verbs
          "cli-fixed-width", "auxents", "verb-bar", "verb-sparkline",
          # round 4vi: put/filter --explain, repl -s script mode
          "dsl-explain", "dsl-hashing",
          # round 4vii: bytes type (b"" literals, substr/concat/cmp,
          # base64/hex codecs), bitwise expression levels, -w/-W
          "dsl-bytes-literals", "dsl-bytes-ops",
          "dsl-bytes-conversions", "dsl-warnings",
          # round 4viii: full REPL session engine (miller_ray/repl.py)
          "repl",
          # round 4ix: online-help surfaces — help prose read from the
          # reference tree at runtime (miller_ray/help_catalog.py),
          # forced-color output, mcp usage
          "repl-help", "help", "cli-help", "mcp",
          "output-colorization",
          # round 5: seeded-PRNG verbs — Go math/rand reproduced
          # bit-faithfully (miller_ray/gorand.py regenerates rngCooked
          # via polynomial jump-ahead), so the reservoir/Knuth-shuffle/
          # resample golden streams replay exactly
          "verb-sample", "verb-shuffle", "verb-bootstrap",
          "verb-bootstrap-ci"]


@pytest.mark.parametrize("suite", SUITES)
def test_suite_has_zero_failures(ray_session, suite):
    r = C.run_suite(suite)
    assert r["fail"] == 0, r["failures"]


def test_overall_coverage(ray_session):
    tot = {"pass": 0, "fail": 0, "skip": 0}
    for suite in SUITES:
        r = C.run_suite(suite)
        for k in tot:
            tot[k] += r[k]
    assert tot["fail"] == 0
    # round-5 end state: the FULL deduped corpus passes — 4,734 golden
    # cases across all 287 unique suites, zero skips. Coverage must
    # not silently shrink.
    assert tot["skip"] == 0, tot
    assert tot["pass"] >= 4734, tot
