"""Golden tests for the lm-eval v0.3 task protocol.

The reference delegates task scoring to lm-eval v0.3 (`evaluate.py:11-84,
165-182`); lm-eval is not installable in this environment, so these goldens
encode v0.3's documented prompt semantics (task classes in
lm_eval/tasks/{superglue,piqa,hellaswag,winogrande,arc,openbookqa,
hendrycks_test}.py and BaseLM._encode_pair in lm_eval/base.py):

  * MultipleChoiceTask continuations are " {choice}"
  * hellaswag preprocesses text (strip, " [title]" → ". ", drop [bracketed],
    collapse double spaces) on both query and endings
  * winogrande varies the CONTEXT per option and scores the shared suffix
    (partial_context/partial_target)
  * arc maps numeric answerKeys 1-5 → A-E
  * hendrycksTest strips the question and scores " A"/" B"/" C"/" D"
  * _encode_pair tokenizes context+continuation jointly and attributes
    boundary BPE merges to the continuation; trailing context whitespace
    moves into the continuation
  * every model's logits are sliced to [:, :, :50257] (evaluate.py:79)
"""

import numpy as np
import pytest

from pb_llm_tpu.eval import tasks as T


def test_boolq_format():
    ex = T.fmt_boolq({"passage": "The sky is blue.", "question": "is the sky blue", "answer": 1})
    assert ex.context == "The sky is blue.\nQuestion: is the sky blue?\nAnswer:"
    assert ex.choices == [" no", " yes"]
    assert ex.gold == 1


def test_piqa_format():
    ex = T.fmt_piqa({"goal": "open a jar", "sol1": "twist the lid", "sol2": "hit it", "label": 0})
    assert ex.context == "Question: open a jar\nAnswer:"
    assert ex.choices == [" twist the lid", " hit it"]


def test_hellaswag_preprocess_and_format():
    doc = {
        "activity_label": "Removing ice from car",
        "ctx_a": "Then, the man writes over the snow covering the window of a car, and a woman wearing winter clothes smiles.",
        "ctx_b": "then",
        "endings": [
            ", the man adds wax to the windshield and cuts it.",
            "does it. [title] He waves. Then [substeps] he stops.",
        ],
        "label": 1,
    }
    ex = T.fmt_hellaswag(doc)
    assert ex.context.startswith("Removing ice from car: Then, the man writes")
    # ctx_b capitalized and joined with a space
    assert ex.context.endswith("smiles. Then")
    # " [title]" → ". " (v0.3's literal replacement, double period included),
    # remaining [bracketed] dropped, "  " collapsed, then the MC " " prefix
    assert ex.choices[1] == " does it.. He waves. Then he stops."
    assert ex.choices[0] == " , the man adds wax to the windshield and cuts it."


def test_winogrande_inverted_contexts():
    doc = {"sentence": "The trophy didn't fit in the case because _ was too big.",
           "option1": "the trophy", "option2": "the case", "answer": "1"}
    ex = T.fmt_winogrande(doc)
    assert ex.contexts == [
        "The trophy didn't fit in the case because the trophy",
        "The trophy didn't fit in the case because the case",
    ]
    # shared continuation = suffix after "_", stripped, with a leading space
    assert ex.choices == [" was too big.", " was too big."]
    assert ex.gold == 0


def test_arc_numeric_answerkey():
    doc = {"question": "Which is a metal?", "answerKey": "3",
           "choices": {"label": ["1", "2", "3", "4"], "text": ["wood", "glass", "iron", "cloth"]}}
    ex = T.fmt_arc(doc)
    assert ex.context == "Question: Which is a metal?\nAnswer:"
    assert ex.gold == 2
    assert ex.choices[2] == " iron"


def test_mmlu_format():
    doc = {"question": "  What is 2+2?  ", "choices": ["3", "4", "5", "6"], "answer": 1}
    ex = T.fmt_mmlu(doc)
    assert ex.context == "What is 2+2?\nA. 3\nB. 4\nC. 5\nD. 6\nAnswer:"
    assert ex.choices == [" A", " B", " C", " D"]
    assert ex.gold == 1


def test_suite_expansion():
    out = T.expand_tasks(["mmlu"])
    assert len(out) == 57 and out[0] == "hendrycksTest-abstract_algebra"
    out = T.expand_tasks(["llmqat"])
    assert out == ["boolq", "piqa", "hellaswag", "winogrande", "arc_easy",
                   "arc_challenge", "openbookqa"]


# ---------------------------------------------------------------------------
# _encode_pair + scoring semantics
# ---------------------------------------------------------------------------


class MergeTokenizer:
    """BPE-like toy: 'ab' at a boundary tokenizes differently than 'a'+'b',
    exposing whether the scorer uses joint encoding (_encode_pair) or not."""

    eos_token_id = 0

    def encode(self, s, add_special_tokens=True):
        ids = []
        i = 0
        while i < len(s):
            if s[i : i + 2] == "ab":
                ids.append(99)
                i += 2
            else:
                ids.append(ord(s[i]))
                i += 1
        return ids


def _mk_scorer(vocab_limit=None):
    # model-free scorer: we only exercise the encoding helpers
    return T.LoglikelihoodScorer(None, None, None, MergeTokenizer(), vocab_limit=vocab_limit)


def test_encode_pair_joint_merge():
    s = _mk_scorer()
    ctx, cont = s._encode_pair("xa", "by")
    # joint "xaby" → [x, 99, y]; ctx "xa" → [x, a]; continuation = suffix
    # after len(ctx)=2 → [y]: the boundary merge is attributed per v0.3
    assert ctx == [ord("x"), ord("a")]
    assert cont == [ord("y")]


def test_encode_pair_trailing_space_shift():
    s = _mk_scorer()
    ctx, cont = s._encode_pair("hi ", "there")
    # v0.3 moves the trailing context space into the continuation
    assert ctx == s._encode("hi")
    assert cont[0] == ord(" ")


def test_vocab_limit_slices_logits():
    """The reference slices every model's logits to :50257 (evaluate.py:79);
    evaluate_model_tasks defaults to that. With a tiny model whose vocab is
    larger than the limit, the slice must change which rows can win."""
    import jax
    import jax.numpy as jnp

    from pb_llm_tpu.models import opt as jopt
    from pb_llm_tpu.models.registry import family_for

    cfg = jopt.OPTConfig(vocab_size=300, hidden_size=32, ffn_dim=64,
                         num_hidden_layers=1, num_attention_heads=4,
                         max_position_embeddings=64)
    params = jopt.init_params(cfg, jax.random.PRNGKey(0))
    fam = family_for("facebook/opt-125m")

    class ByteTok:
        eos_token_id = 1

        def encode(self, s, add_special_tokens=True):
            return [min(ord(c), 255) for c in s]

    s_full = T.LoglikelihoodScorer(params, cfg, fam, ByteTok(), vocab_limit=None)
    s_cut = T.LoglikelihoodScorer(params, cfg, fam, ByteTok(), vocab_limit=64)
    # token ids must lie inside the sliced range (real OPT ids always do —
    # rows ≥ 50257 are embedding padding)
    ll_full, _ = s_full.score("!#%", "+-")
    ll_cut, _ = s_cut.score("!#%", "+-")
    # log-softmax over fewer rows strictly raises each kept row's probability
    assert ll_cut > ll_full


# ---------------------------------------------------------------------------
# few-shot (v0.3 fewshot_context) + declarative task registry
# ---------------------------------------------------------------------------


def test_fewshot_prefix_golden():
    shots = [T.Example("Q: 1+1\nA:", [" 2", " 3"], 0),
             T.Example("Q: 2+2\nA:", [" 4", " 5"], 0)]
    got = T.fewshot_prefix(shots)
    # v0.3: doc_to_text + doc_to_target joined by \n\n, trailing \n\n
    assert got == "Q: 1+1\nA: 2\n\nQ: 2+2\nA: 4\n\n"
    assert T.fewshot_prefix([], description="Answer the question.") == \
        "Answer the question.\n\n"
    assert T.fewshot_prefix(shots, description="D") == \
        "D\n\nQ: 1+1\nA: 2\n\nQ: 2+2\nA: 4\n\n"


def test_fewshot_uses_gold_target_and_contexts():
    # winogrande-style shot: gold context + shared target render the shot;
    # winogrande-style QUERY gets the prefix on every per-option context
    shot = T.Example("ctxA", [" tail", " tail"], 1, contexts=["ctxA", "ctxB"])
    assert T.fewshot_prefix([shot]) == "ctxB tail\n\n"
    query = T.Example("qA", [" t", " t"], 0, contexts=["qA", "qB"])
    out = T.apply_fewshot([query], 1, training=[shot])
    assert out[0].contexts == ["ctxB tail\n\nqA", "ctxB tail\n\nqB"]


def test_fewshot_sampling_deterministic_and_excludes_self():
    exs = [T.Example(f"q{i}", [" a", " b"], 0) for i in range(6)]
    one = T.apply_fewshot(exs, 2)
    two = T.apply_fewshot(exs, 2)
    assert [e.context for e in one] == [e.context for e in two]  # seeded
    for src, out in zip(exs, one):
        assert out.context.endswith(src.context)
        # no-training fallback samples k+1 and drops the query itself
        assert f"{src.context} a\n\n" not in out.context
        assert out.context.count("\n\n") == 2  # exactly 2 shots prefixed


def test_declarative_task_registers_and_scores():
    """A new task added via TaskSpec ONLY (no formatter code): registered
    name flows through expand_tasks/TASK_FORMATTERS and scores end-to-end."""
    import jax

    from pb_llm_tpu.models import opt as jopt
    from pb_llm_tpu.models.registry import family_for

    spec = T.TaskSpec(
        dataset="local/colors", split="test",
        context="Question: {question}\nAnswer:",
        choices_field="options", gold_field="answer",
    )
    T.register_task("colors_qa", spec)
    try:
        assert "colors_qa" in T.TASK_FORMATTERS
        assert T.expand_tasks(["colors_qa"]) == ["colors_qa"]
        docs = [
            {"question": "sky color?", "options": ["blue", "red"], "answer": 0},
            {"question": "grass color?", "options": ["red", "green"], "answer": "1"},
            {"question": "letter?", "options": ["x", "y"], "answer": "B"},
        ]
        fmt = T.TASK_FORMATTERS["colors_qa"]
        exs = [fmt(d) for d in docs]
        assert exs[0].context == "Question: sky color?\nAnswer:"
        assert exs[0].choices == [" blue", " red"]
        assert [e.gold for e in exs] == [0, 1, 1]

        cfg = jopt.OPTConfig(vocab_size=300, hidden_size=32, ffn_dim=64,
                             num_hidden_layers=1, num_attention_heads=4,
                             max_position_embeddings=128)
        params = jopt.init_params(cfg, jax.random.PRNGKey(0))
        fam = family_for("facebook/opt-125m")

        class ByteTok:
            eos_token_id = 1

            def encode(self, s, add_special_tokens=True):
                return [min(ord(c), 255) for c in s]

        out = T.evaluate_model_tasks(
            params, cfg, fam, ByteTok(), ["colors_qa"],
            examples_by_task={"colors_qa": exs}, num_fewshot=1)
        assert out["results"]["colors_qa"]["n"] == 3
        assert 0.0 <= out["results"]["colors_qa"]["acc"] <= 1.0
    finally:
        T.TASK_SPECS.pop("colors_qa", None)
        T.TASK_FORMATTERS.pop("colors_qa", None)
