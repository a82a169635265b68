#!/usr/bin/env python3
"""Generate golden parity cases by EXECUTING the reference engine (alexha11/OpenCEP) on
deterministic synthetic streams. Output: JSON consumed by GoldenSpec.scala."""
import sys, json, random
sys.path.insert(0, '/root/reference')
from datetime import timedelta, datetime, timedelta as td
from CEP import CEP
from base.Pattern import Pattern
from base.PatternStructure import (SeqOperator, AndOperator, PrimitiveEventStructure,
                                   NegationOperator, KleeneClosureOperator)
from condition.Condition import TrueCondition, Variable, SimpleCondition, BinaryCondition
from condition.BaseRelationCondition import GreaterThanCondition, SmallerThanCondition
from condition.KCCondition import KCIndexCondition, KCValueCondition
from condition.CompositeCondition import AndCondition
from base.DataFormatter import DataFormatter, EventTypeClassifier
from base.Event import Event, AggregatedEvent
from stream.Stream import InputStream, OutputStream
from misc.ConsumptionPolicy import ConsumptionPolicy

class Cls(EventTypeClassifier):
    def get_event_type(self, payload): return payload["type"]

class Fmt(DataFormatter):
    def __init__(self): super().__init__(Cls())
    def parse_event(self, raw):
        t, sec, v, i, prob = raw.split(",")
        return {"type": t, "sec": int(sec), "v": float(v), "id": int(i),
                "prob": None if prob == "" else float(prob)}
    def get_event_timestamp(self, payload):
        return datetime(2024, 1, 1) + td(seconds=payload["sec"])
    def get_probability(self, payload):
        return payload["prob"]

class ListStream(InputStream):
    def __init__(self, items):
        super().__init__()
        for i in items: self._stream.put(i)
        self.close()

class Out(OutputStream):
    def __init__(self): super().__init__(); self.items = []
    def add_item(self, item): self.items.append(item); super().add_item(item)

def run_pattern(pattern, events):
    cep = CEP([pattern])
    out = Out()
    cep.run(ListStream(events), out, Fmt())
    matches = []
    for m in out.items:
        slots = []
        for e in m.events:
            if isinstance(e, AggregatedEvent):
                slots.append([pe.payload["id"] for pe in e.primitive_events])
            else:
                slots.append([e.payload["id"]])
        matches.append(slots)
    return matches

P = PrimitiveEventStructure
V = lambda n: Variable(n, lambda x: x["v"])

def gen_stream(seed, n, types, prob=False):
    r = random.Random(seed)
    evs = []
    for i in range(n):
        sec = r.randint(0, 10) * 60  # minute-granularity -> plenty of ties
        v = r.randint(0, 9)
        t = r.choice(types)
        p = round(r.uniform(0.3, 1.0), 2) if prob else None
        evs.append((sec, t, v, p))
    evs.sort(key=lambda x: x[0])
    lines = []
    for i, (sec, t, v, p) in enumerate(evs):
        lines.append(f"{t},{sec},{v},{i},{'' if p is None else p}")
    return lines

CASES = []

def case(name, seed, n, types, structure_fn, cond_tag, window_min, policy=None,
         confidence=None, prob=False):
    events = gen_stream(seed, n, types, prob=prob)
    structure = structure_fn()
    cond = COND_BUILDERS[cond_tag]()
    pat = Pattern(structure, cond, timedelta(minutes=window_min),
                  consumption_policy=policy, confidence=confidence)
    matches = run_pattern(pat, events)
    CASES.append(dict(name=name, seed=seed, events=events, cond=cond_tag,
                      window_min=window_min, matches=matches,
                      policy=POLICY_TAGS.get(name), confidence=confidence))
    print(f"{name}: events={len(events)} matches={len(matches)}")

COND_BUILDERS = {
    "true": lambda: TrueCondition(),
    "b_gt_a": lambda: GreaterThanCondition(V("b"), V("a")),
    "a_gt_5": lambda: SimpleCondition(V("a"), relation_op=lambda x: x > 5),
    "kc_all_le_6": lambda: KCValueCondition({"k"}, lambda x: x["v"], lambda a, b: a <= b, 6),
    "kc_offset_asc": lambda: KCIndexCondition({"k"}, lambda x: x["v"], lambda a, b: a < b, offset=1),
    "kc_idx02": lambda: KCIndexCondition({"k"}, lambda x: x["v"], lambda a, b: a <= b,
                                         first_index=0, second_index=2),
}
POLICY_TAGS = {}

S = lambda *a: SeqOperator(*a)
A = lambda *a: AndOperator(*a)
N = NegationOperator
K = KleeneClosureOperator

structures = {
  "seq3":        (lambda: S(P("A","a"), P("B","b"), P("C","c")), "true", ["A","B","C"], 14),
  "seq3_cond":   (lambda: S(P("A","a"), P("B","b"), P("C","c")), "b_gt_a", ["A","B","C"], 14),
  "seq_nested_and": (lambda: S(P("A","a"), A(P("B","b"), P("C","c")), P("D","d")), "true", ["A","B","C","D"], 13),
  "and3":        (lambda: A(P("A","a"), P("B","b"), P("C","c")), "true", ["A","B","C"], 10),
  "nested_and_of_seqs": (lambda: A(S(P("A","a"), P("B","b")), S(P("C","c"), P("D","d"))), "true", ["A","B","C","D"], 12),
  "seq_of_and_first": (lambda: S(A(P("A","a"), P("B","b")), P("C","c")), "true", ["A","B","C"], 12),
  "kc_basic":    (lambda: S(P("A","a"), K(P("B","k")), P("C","c")), "true", ["A","B","C"], 11),
  "kc_minmax":   (lambda: S(P("A","a"), K(P("B","k"), min_size=2, max_size=4), P("C","c")), "true", ["A","B","C"], 12),
  "kc_value":    (lambda: S(K(P("B","k")), P("C","c")), "kc_all_le_6", ["B","C"], 12),
  "kc_offset":   (lambda: S(K(P("B","k")), P("C","c")), "kc_offset_asc", ["B","C"], 12),
  "kc_idx":      (lambda: S(K(P("B","k"), min_size=3, max_size=4), P("C","c")), "kc_idx02", ["B","C"], 12),
  "not_middle":  (lambda: S(P("A","a"), N(P("B","nb")), P("C","c")), "true", ["A","B","C"], 16),
  "not_begin":   (lambda: S(N(P("B","nb")), P("A","a"), P("C","c")), "true", ["A","B","C"], 14),
  "not_end":     (lambda: S(P("A","a"), P("C","c"), N(P("B","nb"))), "true", ["A","B","C"], 14),
  "not_and":     (lambda: A(P("A","a"), N(P("B","nb")), P("C","c")), "true", ["A","B","C"], 12),
  "not_two":     (lambda: S(P("A","a"), N(P("B","nb")), P("C","c"), N(P("D","nd"))), "true", ["A","B","C","D"], 14),
  "dup_types":   (lambda: S(P("A","a"), P("A","b"), P("B","c")), "true", ["A","B"], 12),
  "seq2_cond":   (lambda: S(P("A","a"), P("B","b")), "b_gt_a", ["A","B"], 16),
}

WINDOWS = {"seq_nested_and": 9, "kc_minmax": 9, "not_middle": 8, "not_begin": 9,
           "not_end": 9, "not_and": 9, "not_two": 10}
SEEDS = {"seq_nested_and": 207, "kc_minmax": 211, "not_end": 312, "not_and": 316, "not_two": 219}
for i, (name, (sf, cond, types, n)) in enumerate(structures.items()):
    w = WINDOWS.get(name, 5 + (i % 4))
    case(name, seed=SEEDS.get(name, 100 + i), n=n, types=types, structure_fn=sf, cond_tag=cond, window_min=w)

# consumption policies (single key stream)
pol_single = ConsumptionPolicy(single=["B"])
pat = Pattern(S(P("A","a"), P("B","b")), TrueCondition(), timedelta(minutes=7),
              consumption_policy=pol_single)
events = gen_stream(300, 14, ["A","B"])
CASES.append(dict(name="policy_single", events=events, cond="true", window_min=7,
                  matches=run_pattern(pat, events), policy={"single": ["B"]}, confidence=None))
print("policy_single:", len(CASES[-1]["matches"]))

pol_contig = ConsumptionPolicy(contiguous=["a", "b"])
pat = Pattern(S(P("A","a"), P("B","b")), TrueCondition(), timedelta(minutes=7),
              consumption_policy=pol_contig)
events = gen_stream(301, 14, ["A","B"])
CASES.append(dict(name="policy_contiguous", events=events, cond="true", window_min=7,
                  matches=run_pattern(pat, events), policy={"contiguous": [["a","b"]]}, confidence=None))
print("policy_contiguous:", len(CASES[-1]["matches"]))

pol_freeze = ConsumptionPolicy(freeze="b")
pat = Pattern(S(P("A","a"), P("B","b"), P("C","c")), TrueCondition(), timedelta(minutes=7),
              consumption_policy=pol_freeze)
events = gen_stream(305, 18, ["A","B","C"])
CASES.append(dict(name="policy_freeze", events=events, cond="true", window_min=7,
                  matches=run_pattern(pat, events), policy={"freeze": ["b"]}, confidence=None))
print("policy_freeze:", len(CASES[-1]["matches"]))

# probabilistic stream + confidence
pat = Pattern(S(P("A","a"), P("B","b")), TrueCondition(), timedelta(minutes=7),
              confidence=0.5)
events = gen_stream(303, 14, ["A","B"], prob=True)
CASES.append(dict(name="prob_confidence", events=events, cond="true", window_min=7,
                  matches=run_pattern(pat, events), policy=None, confidence=0.5))
print("prob_confidence:", len(CASES[-1]["matches"]))

with open('/root/repo/src/test/resources/golden/reference_cases.json', 'w') as f:
    json.dump(CASES, f, indent=1)
print(f"total cases: {len(CASES)}")
