"""LLM-based pair matching — the external-service integration point.

The reference's OllamaMatching (src/pyjedai/llm_matching.py:110-362)
walks candidate pairs in a driver-side python loop, one blocking
``ollama.chat`` HTTP call per pair. Spark-first, the same semantics
become a ``mapInPandas`` stage over the candidate-pair frame joined
with both records' texts: each Arrow batch is classified by a
batched transport callable, so

- the LLM calls run ON THE EXECUTORS, parallel across partitions
  (pair throughput scales with cluster size x service capacity, not
  with one driver loop);
- the transport is INJECTED — any ``list[prompt] -> list[response]``
  callable. Production wires an HTTP client for a local Ollama /
  vLLM / TGI sidecar (the standard per-node serving layout); the
  default transport is import-guarded and raises with guidance when
  no ``ollama`` package/endpoint exists (this sandbox has none), and
  tests inject a deterministic fake — the Spark-side plumbing
  (prompt construction, batching, response parsing, schema) is real
  and tested either way.

Prompt + parse replicate the reference exactly: the
``record 1: {r1}, record 2: {r2}. Answer with True. or False.`` query
(llm_matching.py:199), a response is a match iff it equals ``True``
after stripping the stop tokens the reference configures
(``{'stop': ['\\n', '.']}``, llm_matching.py:204).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# llm_matching.py:14-19
DEFAULT_SYSTEM_PROMPT = (
    "You are given two record descriptions and your task is to identify\n"
    "if the records refer to the same entity or not.\n\n"
    "You must answer with just one word:\n"
    "True. if the records are referring to the same entity,\n"
    "False. if the records are referring to a different entity."
)


def ollama_transport(model: str, host: str | None = None,
                     system_prompt: str = DEFAULT_SYSTEM_PROMPT):
    """Build the production transport: a batched callable that sends
    each prompt to an Ollama endpoint (one chat call per prompt, batch
    = one Arrow partition's worth). Import-guarded: raises a clear
    ImportError when the ``ollama`` package is absent (as in this
    sandbox)."""
    def transport(prompts: list[str]) -> list[str]:
        try:
            import ollama
        except ImportError as ex:
            raise ImportError(
                "llm_match needs the `ollama` package + a reachable "
                "Ollama server on every executor; inject a custom "
                "transport callable instead for other serving stacks"
            ) from ex
        client = ollama.Client(host=host) if host else ollama
        out = []
        for q in prompts:
            resp = client.chat(
                model=model,
                messages=[{"role": "system", "content": system_prompt},
                          {"role": "user", "content": q}],
                options={"stop": ["\n", "."]},
                stream=False)
            out.append(resp["message"]["content"])
        return out
    return transport


def llm_match(pairs: DataFrame, docs: DataFrame, transport,
              id_col: str = "doc_id", text_col: str = "text",
              keep_responses: bool = False) -> DataFrame:
    """Classify candidate pairs with an LLM transport.

    ``pairs``: (id1, id2); ``docs``: the record table; ``transport``:
    picklable ``list[str] -> list[str]`` (see :func:`ollama_transport`).
    Returns (id1, id2, is_match int) — plus ``response`` when
    ``keep_responses`` (debugging/audit). Matching pairs are those the
    model answers ``True`` for, exactly the reference's acceptance test
    (llm_matching.py:210).
    """
    import pandas as pd

    t = docs.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
    j = (
        pairs.select("id1", "id2")
        .join(t.select(F.col("_id").alias("id1"), F.col("_t").alias("_t1")), "id1")
        .join(t.select(F.col("_id").alias("id2"), F.col("_t").alias("_t2")), "id2")
    )

    def _classify(batches):
        for pdf in batches:
            prompts = [
                f"record 1: {r1}, record 2: {r2}. Answer with True. or False."
                for r1, r2 in zip(pdf["_t1"].fillna(""), pdf["_t2"].fillna(""))
            ]
            resp = transport(prompts)
            # the reference sets stop=['\n','.'] server-side; normalize
            # the same way for transports that return full text
            clean = [str(r).split("\n")[0].split(".")[0].strip() for r in resp]
            yield pd.DataFrame({
                "id1": pdf["id1"], "id2": pdf["id2"],
                "is_match": [1 if c == "True" else 0 for c in clean],
                "response": clean,
            })

    out = j.mapInPandas(
        _classify, "id1 long, id2 long, is_match int, response string")
    return out if keep_responses else out.select("id1", "id2", "is_match")
