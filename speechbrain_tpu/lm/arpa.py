"""ARPA n-gram LM file reading/writing.

Parity target: reference ``lm/arpa.py:68`` (read_arpa).

ARPA format:
    \\data\\
    ngram 1=<count>
    ...
    \\1-grams:
    <logp> <token> [<backoff>]
    ...
    \\end\\
"""

import collections

__all__ = ["read_arpa", "arpa_to_backoff_dicts", "write_arpa"]


def read_arpa(fstream):
    """Parse an ARPA file stream.

    Returns (num_grams_by_order, ngrams_by_order, backoffs_by_order):
    - ngrams_by_order[n] = {context_tuple: {token: logp}}
    - backoffs_by_order[n] = {ngram_tuple: backoff_logp}

    Example
    -------
    >>> import io
    >>> arpa = io.StringIO('''\\\\data\\\\
    ... ngram 1=2
    ... ngram 2=1
    ...
    ... \\\\1-grams:
    ... -0.5 a -0.3
    ... -0.7 b
    ...
    ... \\\\2-grams:
    ... -0.2 a b
    ...
    ... \\\\end\\\\
    ... ''')
    >>> num, ngrams, backoffs = read_arpa(arpa)
    >>> num[1], num[2]
    (2, 1)
    >>> round(ngrams[2][('a',)]['b'], 1)
    -0.2
    """
    num_grams = {}
    ngrams = {}
    backoffs = {}
    section = None
    for line in fstream:
        line = line.strip()
        if not line:
            continue
        if line == "\\data\\":
            section = "data"
            continue
        if line == "\\end\\":
            break
        if line.startswith("\\") and line.endswith("-grams:"):
            order = int(line[1:].split("-")[0])
            section = order
            ngrams[order] = collections.defaultdict(dict)
            backoffs[order] = {}
            continue
        if section == "data":
            if line.startswith("ngram"):
                spec = line.split()[1]
                order, count = spec.split("=")
                num_grams[int(order)] = int(count)
            continue
        if isinstance(section, int):
            # logp <tab-or-space> tok1 tok2 ... [backoff]; tokens never
            # contain whitespace, so a generic split is unambiguous.
            parts = line.split()
            logp = float(parts[0])
            if len(parts) == section + 2:
                tokens = tuple(parts[1:-1])
                backoff = float(parts[-1])
            else:
                tokens = tuple(parts[1 : section + 1])
                backoff = None
            context, token = tokens[:-1], tokens[-1]
            ngrams[section][context][token] = logp
            if backoff is not None:
                backoffs[section][tokens] = backoff
    # Convert defaultdicts to plain dicts
    ngrams = {k: dict(v) for k, v in ngrams.items()}
    return num_grams, ngrams, backoffs


def arpa_to_backoff_dicts(fstream):
    """Read ARPA into the (ngrams, backoffs) form BackoffNgramLM takes."""
    _, ngrams, backoffs = read_arpa(fstream)
    flat_backoffs = {}
    for order_backoffs in backoffs.values():
        flat_backoffs.update(order_backoffs)
    return ngrams, flat_backoffs


def write_arpa(fstream, ngrams, backoffs=None):
    """Write an LM in ARPA format (inverse of read_arpa)."""
    backoffs = backoffs or {}
    orders = sorted(ngrams.keys())
    print("\\data\\", file=fstream)
    for order in orders:
        count = sum(len(tokens) for tokens in ngrams[order].values())
        print(f"ngram {order}={count}", file=fstream)
    print("", file=fstream)
    for order in orders:
        print(f"\\{order}-grams:", file=fstream)
        for context, tokens in ngrams[order].items():
            for token, logp in tokens.items():
                gram = context + (token,)
                if gram in backoffs:
                    print(
                        f"{logp}\t{' '.join(gram)}\t{backoffs[gram]}",
                        file=fstream,
                    )
                else:
                    print(f"{logp}\t{' '.join(gram)}", file=fstream)
        print("", file=fstream)
    print("\\end\\", file=fstream)
