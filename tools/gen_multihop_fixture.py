#!/usr/bin/env python3
"""Regenerate the e2e eval fixture (src/test/resources/eval/) as the legacy
8-passage/6-question block PLUS a deterministic synthetic multi-hop set where
graph-RAG structurally beats naive dense retrieval — mirroring the direction
of the reference's published HotpotQA gap (87.8% graph vs 73.4% naive).

The synthetic design (r14: 72 two-hop chains + 72 three-hop chains + 100
distractors -> 150 questions over 468 passages; families below):
  chain i:  passage A_i (title Quillon{i}):  "Quillon{i} unearthed the
            relic oblidor{i} ..."  triple (Quillon{i}, unearthed, relic oblidor{i})
            passage B_i (title Chamber {i}): "The recovered artifact now
            rests inside ferrovault{i} ..."  triple (relic oblidor{i},
            sealed within, ferrovault{i})
  B_i's TEXT refers to the relic only as "the recovered artifact" — the
  canonical name lives in the OpenIE triple (what entity linking/coref
  produces), so a dense retriever has no lexical or hash-embedding handle on
  B_i, while the graph path reaches it through the oblidor{i} entity node.

  hidden question (i < 25):  "In which vault is the relic oblidor{i} kept?"
    gold = [A_i, B_i]; naive finds only A_i (shares the relic-name tokens),
    graph expands the relic entity -> both relations -> both passages.
  The entity name is TWO tokens (relic + oblidor{i}) so the question-relation
  cosine signal (2 shared buckets) strictly dominates single-bucket hash-
  collision noise, and the predicate is "sealed within" so no stopword
  ("in") leaks a shared bucket into every other relation.
  direct question (i >= 25): "Who unearthed the relic oblidor{i}?"
    gold = [A_i]; both paths find it (the naive-friendly control half).

Deterministic: no RNG anywhere; rerunning this script reproduces the files
byte-for-byte. Invented tokens (quillon/oblidor/ferrovault) cannot collide
with legacy-corpus or distractor vocabulary under the hash embedder.
"""
import json
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "eval")

LEGACY_CORPUS = [
    {"title": "Albert Einstein", "text": "Albert Einstein published the theory of relativity in 1905 while working at the patent office."},
    {"title": "Marie Curie", "text": "Marie Curie discovered radium and polonium and won two Nobel prizes."},
    {"title": "Charles Darwin", "text": "Charles Darwin wrote On the Origin of Species in 1859 after his voyage."},
    {"title": "Isaac Newton", "text": "Isaac Newton formulated the laws of motion and universal gravitation."},
    {"title": "Ada Lovelace", "text": "Ada Lovelace wrote the first algorithm for the analytical engine of Charles Babbage."},
    {"title": "Alan Turing", "text": "Alan Turing proposed the Turing machine and broke the Enigma cipher at Bletchley Park."},
    {"title": "Rosalind Franklin", "text": "Rosalind Franklin produced the X-ray images of DNA that revealed the double helix."},
    {"title": "Nikola Tesla", "text": "Nikola Tesla developed the alternating current induction motor."},
]

LEGACY_QUESTIONS = [
    {"_id": "q1", "type": "compositional", "question": "When did Albert Einstein publish his theory of relativity?", "answer": "1905", "supporting_facts": [["Albert Einstein", 0]]},
    {"_id": "q2", "type": "compositional", "question": "What did Marie Curie discover?", "answer": "radium and polonium", "supporting_facts": [["Marie Curie", 0]]},
    {"_id": "q3", "type": "compositional", "question": "Who wrote On the Origin of Species?", "answer": "Charles Darwin", "supporting_facts": [["Charles Darwin", 0]]},
    {"_id": "q4", "type": "compositional", "question": "Who wrote the first algorithm for the analytical engine?", "answer": "Ada Lovelace", "supporting_facts": [["Ada Lovelace", 0]]},
    {"_id": "q5", "type": "compositional", "question": "Who proposed the Turing machine?", "answer": "Alan Turing", "supporting_facts": [["Alan Turing", 0]]},
    {"_id": "q6", "type": "compositional", "question": "Who produced the X-ray images of DNA?", "answer": "Rosalind Franklin", "supporting_facts": [["Rosalind Franklin", 0]]},
]

LEGACY_NER = [
    ("q1", "When did Albert Einstein publish his theory of relativity?", "1905", ["Albert Einstein", "theory of relativity"]),
    ("q2", "What did Marie Curie discover?", "radium and polonium", ["Marie Curie"]),
    ("q3", "Who wrote On the Origin of Species?", "Charles Darwin", ["On the Origin of Species"]),
    ("q4", "Who wrote the first algorithm for the analytical engine?", "Ada Lovelace", ["analytical engine", "first algorithm"]),
    ("q5", "Who proposed the Turing machine?", "Alan Turing", ["Turing machine"]),
    ("q6", "Who produced the X-ray images of DNA?", "Rosalind Franklin", ["X-ray images", "DNA"]),
]

LEGACY_OPENIE = [
    {"title": "Albert Einstein", "passage": "Albert Einstein\nAlbert Einstein published the theory of relativity in 1905 while working at the patent office.", "extracted_entities": ["Albert Einstein", "theory of relativity", "1905"], "extracted_triples": [["Albert Einstein", "published", "theory of relativity"], ["theory of relativity", "published in", "1905"], ["Albert Einstein", "worked at", "patent office"]]},
    {"title": "Marie Curie", "passage": "Marie Curie\nMarie Curie discovered radium and polonium and won two Nobel prizes.", "extracted_entities": ["Marie Curie", "radium", "polonium"], "extracted_triples": [["Marie Curie", "discovered", "radium"], ["Marie Curie", "discovered", "polonium"], ["Marie Curie", "won", "Nobel prizes"]]},
    {"title": "Charles Darwin", "passage": "Charles Darwin\nCharles Darwin wrote On the Origin of Species in 1859 after his voyage.", "extracted_entities": ["Charles Darwin", "On the Origin of Species"], "extracted_triples": [["Charles Darwin", "wrote", "On the Origin of Species"], ["On the Origin of Species", "written in", "1859"]]},
    {"title": "Isaac Newton", "passage": "Isaac Newton\nIsaac Newton formulated the laws of motion and universal gravitation.", "extracted_entities": ["Isaac Newton", "laws of motion"], "extracted_triples": [["Isaac Newton", "formulated", "laws of motion"], ["Isaac Newton", "formulated", "universal gravitation"]]},
    {"title": "Ada Lovelace", "passage": "Ada Lovelace\nAda Lovelace wrote the first algorithm for the analytical engine of Charles Babbage.", "extracted_entities": ["Ada Lovelace", "analytical engine", "Charles Babbage"], "extracted_triples": [["Ada Lovelace", "wrote", "first algorithm"], ["first algorithm", "ran on", "analytical engine"], ["analytical engine", "built by", "Charles Babbage"]]},
    {"title": "Alan Turing", "passage": "Alan Turing\nAlan Turing proposed the Turing machine and broke the Enigma cipher at Bletchley Park.", "extracted_entities": ["Alan Turing", "Turing machine", "Enigma"], "extracted_triples": [["Alan Turing", "proposed", "Turing machine"], ["Alan Turing", "broke", "Enigma cipher"], ["Alan Turing", "worked at", "Bletchley Park"]]},
    {"title": "Rosalind Franklin", "passage": "Rosalind Franklin\nRosalind Franklin produced the X-ray images of DNA that revealed the double helix.", "extracted_entities": ["Rosalind Franklin", "DNA", "double helix"], "extracted_triples": [["Rosalind Franklin", "produced", "X-ray images"], ["X-ray images", "revealed", "double helix"], ["X-ray images", "show", "DNA"]]},
    {"title": "Nikola Tesla", "passage": "Nikola Tesla\nNikola Tesla developed the alternating current induction motor.", "extracted_entities": ["Nikola Tesla", "alternating current"], "extracted_triples": [["Nikola Tesla", "developed", "induction motor"], ["induction motor", "uses", "alternating current"]]},
]

N_CHAINS = 72      # 2-hop chains (A: explorer->relic, B: relic->vault)
N_HIDDEN = 36      # first half ask the coref-hidden bridge question
N_CHAINS3 = 72     # 3-hop chains (A: explorer->relic, B: relic->vault, C: vault->warden)
N_HIDDEN3 = 36     # first half ask the full 3-hop question (gold = A,B,C)
N_DISTRACTORS = 100

# A-passage wording variants (deterministic by i) — the explorer/relic hop.
A_TEMPLATES = [
    "{exp} unearthed the {relic} during a long expedition across the dunes.",
    "After years of digging, {exp} unearthed the {relic} beneath the ruins.",
    "{exp} unearthed the {relic} and carried it home through the mountain pass.",
]  # {relic} is the two-token canonical name "relic oblidorN"
# B-passage wording variants — the relic is NEVER named in the text (coref:
# "the recovered artifact"); the canonical name rides only in the triple.
B_TEMPLATES = [
    "The recovered artifact now rests inside {vault} behind triple locks.",
    "Curators moved the recovered artifact into {vault} for safekeeping.",
    "Under heavy watch, the recovered artifact sits inside {vault} today.",
]
D_TEMPLATES = [
    "Clerk{j} tallied the waxen bundles at depot{j} before the winter frost.",
    "At depot{j}, clerk{j} weighed the hemp coils against the brass standard.",
    "Clerk{j} logged the tallow crates arriving at depot{j} by barge.",
]


def main():
    corpus = list(LEGACY_CORPUS)
    questions = list(LEGACY_QUESTIONS)
    ner = list(LEGACY_NER)
    openie = list(LEGACY_OPENIE)

    for i in range(N_CHAINS):
        exp, relic, vault = f"Quillon{i}", f"relic oblidor{i}", f"ferrovault{i}"
        a_title, b_title = f"Quillon{i}", f"Chamber {i}"
        a_text = A_TEMPLATES[i % len(A_TEMPLATES)].format(exp=exp, relic=relic)
        b_text = B_TEMPLATES[i % len(B_TEMPLATES)].format(vault=vault)
        corpus.append({"title": a_title, "text": a_text})
        corpus.append({"title": b_title, "text": b_text})
        openie.append({
            "title": a_title, "passage": f"{a_title}\n{a_text}",
            "extracted_entities": [exp, relic],
            "extracted_triples": [[exp, "unearthed", relic]]})
        openie.append({
            "title": b_title, "passage": f"{b_title}\n{b_text}",
            "extracted_entities": [relic, vault],
            "extracted_triples": [[relic, "sealed within", vault]]})
        qid = f"mh{i}"
        if i < N_HIDDEN:
            q = f"In which vault is the {relic} kept?"
            questions.append({"_id": qid, "type": "bridge", "question": q,
                              "answer": vault,
                              "supporting_facts": [[a_title, 0], [b_title, 0]]})
            ner.append((qid, q, vault, [relic]))
        else:
            q = f"Who unearthed the {relic}?"
            questions.append({"_id": qid, "type": "bridge", "question": q,
                              "answer": exp,
                              "supporting_facts": [[a_title, 0]]})
            ner.append((qid, q, exp, [relic]))

    # 3-hop chains (r14): a third passage C names the WARDEN of the vault,
    # but C's text never names the vault ("the buried strongroom") — the
    # vault name rides only in C's triple, like B's relic. So:
    #   3-hop question (i < N_HIDDEN3): "Who guards the vault that holds the
    #     relic skarniteN?"  gold = [A, B, C]; naive shares tokens only with
    #     A; the graph path needs TWO entity hops (relic -> vault -> warden),
    #     i.e. expansionDegree >= 2.
    #   vault-hidden question (i >= N_HIDDEN3): "Who is responsible for
    #     doomvaultN?"  gold = [C]; the question names an entity that C's
    #     TEXT never contains AND shares zero content tokens with ANY
    #     C-template wording ('responsible' appears in none of them) — pure
    #     entity-linking retrieval, naive has no lexical handle at all.
    #     (r14 review catch: the original "Who keeps watch over X?" shared
    #     keeps/watch/over with C_TEMPLATES[0], handing naive a lexical
    #     handle on a third of the family.)
    # Distinct invented vocab (vandrel/skarnite/doomvault/greyfell) so the
    # two chain families cannot hash-collide into each other's questions.
    C_TEMPLATES = [
        "Warden greyfell{i} keeps watch over the buried strongroom day and night.",
        "The buried strongroom has been patrolled by warden greyfell{i} for decades.",
        "Every dawn warden greyfell{i} inspects the seals of the buried strongroom.",
    ]
    for i in range(N_CHAINS3):
        exp, relic = f"Vandrel{i}", f"relic skarnite{i}"
        vault, warden = f"doomvault{i}", f"warden greyfell{i}"
        a_title, b_title, c_title = f"Vandrel{i}", f"Crypt {i}", f"Watch {i}"
        a_text = A_TEMPLATES[i % len(A_TEMPLATES)].format(exp=exp, relic=relic)
        b_text = B_TEMPLATES[i % len(B_TEMPLATES)].format(vault=vault)
        c_text = C_TEMPLATES[i % len(C_TEMPLATES)].format(i=i)
        corpus.append({"title": a_title, "text": a_text})
        corpus.append({"title": b_title, "text": b_text})
        corpus.append({"title": c_title, "text": c_text})
        openie.append({
            "title": a_title, "passage": f"{a_title}\n{a_text}",
            "extracted_entities": [exp, relic],
            "extracted_triples": [[exp, "unearthed", relic]]})
        openie.append({
            "title": b_title, "passage": f"{b_title}\n{b_text}",
            "extracted_entities": [relic, vault],
            "extracted_triples": [[relic, "sealed within", vault]]})
        openie.append({
            "title": c_title, "passage": f"{c_title}\n{c_text}",
            "extracted_entities": [vault, warden],
            "extracted_triples": [[vault, "guarded by", warden]]})
        if i < N_HIDDEN3:
            qid = f"t{i}"
            q = f"Who guards the vault that holds the {relic}?"
            questions.append({"_id": qid, "type": "bridge", "question": q,
                              "answer": warden,
                              "supporting_facts": [[a_title, 0], [b_title, 0],
                                                   [c_title, 0]]})
            ner.append((qid, q, warden, [relic]))
        else:
            qid = f"v{i}"
            q = f"Who is responsible for {vault}?"
            questions.append({"_id": qid, "type": "bridge", "question": q,
                              "answer": warden,
                              "supporting_facts": [[c_title, 0]]})
            ner.append((qid, q, warden, [vault]))

    for j in range(N_DISTRACTORS):
        title = f"Ledger {j}"
        text = D_TEMPLATES[j % len(D_TEMPLATES)].format(j=j)
        corpus.append({"title": title, "text": text})
        openie.append({
            "title": title, "passage": f"{title}\n{text}",
            "extracted_entities": [f"clerk{j}", f"depot{j}"],
            "extracted_triples": [[f"clerk{j}", "worked at", f"depot{j}"]]})

    with open(os.path.join(OUT, "test_corpus.json"), "w") as f:
        f.write("[\n" + ",\n".join(
            "  " + json.dumps(c) for c in corpus) + "\n]\n")
    with open(os.path.join(OUT, "test_questions.json"), "w") as f:
        f.write("[\n" + ",\n".join(
            "  " + json.dumps(q) for q in questions) + "\n]\n")
    with open(os.path.join(OUT, "openie_results.json"), "w") as f:
        f.write('{"docs": [\n' + ",\n".join(
            "  " + json.dumps(d) for d in openie) +
            '\n], "avg_ent_chars": 12, "avg_ent_words": 2}\n')
    with open(os.path.join(OUT, "ner_cache.tsv"), "w") as f:
        f.write("id\tquestion\tanswer\tanswerable\tparagraphs\ttriples\n")
        for qid, q, ans, ents in ner:
            f.write(f"{qid}\t{q}\t{ans}\ttrue\t[]\t" +
                    json.dumps({"named_entities": ents}) + "\n")
    print(f"corpus={len(corpus)} questions={len(questions)} openie={len(openie)}")


if __name__ == "__main__":
    main()
