"""ECO detector quality on a HARD corpus (VERDICT r3 weak #3).

The round-3 detector metrics were all exactly 1.0 because the synthetic
CLEAR corpus is trivially separable: forget and retain prompts share no
name tokens, so a unigram cue suffices.  This corpus removes that cue:

- **Shared name parts.** Persons are First+Last combinations drawn from
  small shared pools; every forget person's first name AND last name also
  appear in retain persons.  "Is this a forget prompt?" requires the
  *conjunction* of name parts, not either token alone.
- **Paraphrase overlap.** Both classes use the same 16 question templates;
  the held-out set uses 4 templates never seen in training, so the score
  measures entity detection under novel phrasing, not template recall.
- **Token-tagger confusion.** Entities are the forget FULL names; the
  tagger must tag "Avery Sloane" but not the "Avery" in "Avery Whitfield"
  two prompts later.

Reference anchor: methods/eco/classifier.py:29-104 (the hub detectors the
reference consumes with no recorded quality at all).

  python examples/eco_hard_detectors.py [outdir]

Writes <outdir>/metrics_hard.json (checked in under examples/eco_detectors/).
"""

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIRST = ["Avery", "Rowan", "Marlo", "Sasha", "Ember", "Kiran",
         "Noor", "Teagan", "Zia", "Corin", "Lior", "Wren"]
LAST = ["Sloane", "Whitfield", "Okafor", "Bram", "Castellan", "Ferro",
        "Ishikawa", "Lund", "Moreau", "Petrov", "Quill", "Varga"]

TRAIN_TEMPLATES = [
    "What is known about {n}?",
    "Tell me about {n}.",
    "Describe {n}'s favorite pastime.",
    "Where did {n} grow up?",
    "Summarize the biography of {n}.",
    "What does {n} enjoy doing on weekends?",
    "Give a short profile of {n}.",
    "Who exactly is {n}?",
    "Explain what {n} is best remembered for.",
    "List three facts about {n}.",
    "What hobbies does {n} pursue?",
    "In one sentence, introduce {n} to a stranger.",
]
HELDOUT_TEMPLATES = [  # never seen in training: paraphrase generalization
    "Could you share some background on {n}, please?",
    "I keep hearing the name {n} — what's the story there?",
    "Compose a brief biographical note regarding {n}.",
    "If {n} walked into the room, how would you describe them?",
]


def build_corpus(n_forget=8, n_retain=40, seed=0):
    import random

    rng = random.Random(seed)
    combos = [(f, last) for f in FIRST for last in LAST]
    rng.shuffle(combos)
    persons = combos[: n_forget + n_retain]
    forget_p = persons[:n_forget]
    retain_p = persons[n_forget:]
    # guarantee full name-part overlap: every forget first/last name occurs
    # in at least one retain person (append needed combos from the pool —
    # swapping existing retain entries could undo an earlier guarantee)
    pool = combos[n_forget + n_retain:]
    for f, last in forget_p:
        if not any(rf == f for rf, _ in retain_p):
            j = next(k for k, (pf, _) in enumerate(pool) if pf == f)
            retain_p.append(pool.pop(j))
        if not any(rl == last for _, rl in retain_p):
            j = next(k for k, (_, pl_) in enumerate(pool) if pl_ == last)
            retain_p.append(pool.pop(j))
    names = lambda ps: [f"{f} {last}" for f, last in ps]
    return names(forget_p), names(retain_p)


def prompts_for(names, templates):
    return [t.format(n=n) for n in names for t in templates]


def generic_ner_baseline(prompts, entities):
    """Reference-style anchor (methods/eco/classifier.py:51-104): the
    reference consumes a GENERIC pretrained NER pipeline (hub download)
    that tags every PERSON span — it cannot tell a forget person from a
    retain person sharing name parts, it only finds names.  Zero-egress
    stand-in: maximal capitalized-alpha spans (dropping sentence-initial
    template openers), which is exactly what generic NER emits on this
    template corpus.  Scored with the same char-span metric as the
    learned tagger (train_classifiers.evaluate_token_classifier)."""
    import re

    lowered = [e.lower() for e in entities]
    tp = fp = fn = 0
    for p in prompts:
        low = p.lower()
        gold = set()
        for e in lowered:
            start = 0
            while (j := low.find(e, start)) != -1:
                gold.update(range(j, j + len(e)))
                start = j + 1
        pred = set()
        for m in re.finditer(r"\b[A-Z][a-z]+(?:\s+[A-Z][a-z]+)*\b", p):
            a, b = m.span()
            if a == 0:  # sentence-initial opener is not an entity word
                first = p.find(" ", a)
                if first == -1 or first >= b:
                    continue
                a = first + 1
            pred.update(range(a, b))
        tp += len(pred & gold)
        fp += len(pred - gold)
        fn += len(gold - pred)
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    return {
        "recipe": "generic NER spans (every person tagged), no forget/"
                  "retain discrimination — the reference's TokenClassifier "
                  "pipeline shape",
        "precision": prec, "recall": rec,
        "span_f1": 2 * prec * rec / max(prec + rec, 1e-12),
        "n_prompts": len(prompts),
    }


def main():
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "examples/eco_detectors")
    out.mkdir(parents=True, exist_ok=True)
    work = Path("/tmp/eco_hard")

    from multimodal_unlearning_tpu.methods.eco.train_classifiers import (
        evaluate_prompt_classifier,
        evaluate_token_classifier,
        train_prompt_classifier,
        train_token_classifier,
    )

    forget_names, retain_names = build_corpus()
    f_first = {n.split()[0] for n in forget_names}
    f_last = {n.split()[1] for n in forget_names}
    r_first = {n.split()[0] for n in retain_names}
    r_last = {n.split()[1] for n in retain_names}

    forget_tr = prompts_for(forget_names, TRAIN_TEMPLATES)
    retain_tr = prompts_for(retain_names, TRAIN_TEMPLATES)
    forget_ho = prompts_for(forget_names, HELDOUT_TEMPLATES)
    retain_ho = prompts_for(retain_names, HELDOUT_TEMPLATES)

    p_dir = train_prompt_classifier(
        forget_tr, retain_tr, work / "prompt_classifier", epochs=400, seed=0)
    t_dir = train_token_classifier(
        forget_tr + retain_tr, forget_names, work / "token_classifier",
        epochs=400, seed=0)

    metrics = {
        "corpus": {
            "description": "shared-name-part persons, shared templates, "
                           "held-out = 4 templates never seen in training",
            "n_forget_persons": len(forget_names),
            "n_retain_persons": len(retain_names),
            "first_name_pool": len(FIRST), "last_name_pool": len(LAST),
            "distinct_forget_first_names": len(f_first),
            "distinct_forget_last_names": len(f_last),
            "every_forget_first_name_in_retain": f_first <= r_first,
            "every_forget_last_name_in_retain": f_last <= r_last,
            "train_templates": len(TRAIN_TEMPLATES),
            "heldout_templates": len(HELDOUT_TEMPLATES),
            "n_forget_heldout": len(forget_ho),
            "n_retain_heldout": len(retain_ho),
        },
        "prompt_classifier": evaluate_prompt_classifier(p_dir, forget_ho, retain_ho),
        "token_classifier": evaluate_token_classifier(
            t_dir, forget_ho + retain_ho, forget_names),
        # the comparison point VERDICT r4 #7 asked for: the learned tagger
        # must beat the generic-NER recipe the reference actually ships,
        # which tags retain persons too (precision floor = forget share)
        "token_classifier_reference_baseline": generic_ner_baseline(
            forget_ho + retain_ho, forget_names),
    }
    (out / "metrics_hard.json").write_text(json.dumps(metrics, indent=2))
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
