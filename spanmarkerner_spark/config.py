"""Engine configuration + label-scheme detection.

Reimplements the *semantics* of the reference's config system
(/root/reference/span_marker/configuration.py:47-147): a label
vocabulary that may be "schemed" (IOB/IOB2/BIOES/BILOU prefixes) or
schemeless, a mandatory outside label ``O``, a reduced schemeless
label space, and the three length budgets (model_max_length,
marker_max_length, entity_max_length).

Scheme detection is a one-time, driver-side function over the label
list (SURVEY.md §1.3); the reduced label catalog is broadcast to
executors as a tiny dict.
"""

from __future__ import annotations

from dataclasses import dataclass, field

#: Tag letters per scheme, mirroring the dialects the reference
#: normalizes (span_marker/label_normalizer.py:70-116).
SCHEMES = {
    "IOB2": {"B", "I", "O"},
    "BIOES": {"B", "I", "O", "E", "S"},
    "BILOU": {"B", "I", "L", "O", "U"},
}


def detect_scheme(labels: list[str]) -> str | None:
    """Return 'IOB2' / 'BIOES' / 'BILOU' or None (schemeless).

    Semantics of SpanMarkerConfig.are_labels_schemed +
    group_label_ids_by_tag (configuration.py:104-147): every non-O
    label must look like ``<TAG>-<name>`` and the set of tags must be
    a subset of one scheme's alphabet.
    """
    tags = set()
    for lab in labels:
        if lab == "O":
            tags.add("O")
            continue
        if len(lab) < 3 or lab[1] != "-":
            return None
        tags.add(lab[0])
    # prefer the smallest alphabet that covers the observed tags
    for name in ("IOB2", "BIOES", "BILOU"):
        if tags <= SCHEMES[name]:
            return name
    return None


@dataclass
class SpanMarkerConfig:
    """Label vocabulary + length budgets.

    ``labels`` is the full (possibly schemed) label list; ``id2label``
    / ``label2id`` / ``id2reduced_id`` mirror configuration.py:85-95.
    The outside label "O" is mandatory (configuration.py:81-82).
    """

    labels: list[str]
    model_max_length: int = 64      # text-token budget
    marker_max_length: int = 32     # max span pairs per physical sample
    entity_max_length: int = 6      # max words per candidate span
    hidden_size: int = 32           # stand-in encoder width
    vocab_size: int = 4096          # hashed subword vocab
    seed: int = 20260416            # deterministic weight seed

    scheme: str | None = field(init=False)
    id2label: dict[int, str] = field(init=False)
    label2id: dict[str, int] = field(init=False)
    #: schemed-id -> reduced schemeless id
    id2reduced_id: dict[int, int] = field(init=False)
    #: reduced schemeless vocabulary
    reduced_labels: list[str] = field(init=False)
    outside_id: int = field(init=False)

    def __post_init__(self) -> None:
        if "O" not in self.labels:
            raise ValueError(
                "SpanMarkerConfig requires an 'O' (outside) label"
            )
        self.scheme = detect_scheme(self.labels)
        self.id2label = dict(enumerate(self.labels))
        self.label2id = {l: i for i, l in self.id2label.items()}
        if self.scheme is None:
            self.reduced_labels = list(self.labels)
            self.id2reduced_id = {i: i for i in self.id2label}
        else:
            # strip the scheme prefix; keep first-seen order, O first
            reduced: list[str] = []
            for lab in self.labels:
                base = "O" if lab == "O" else lab[2:]
                if base not in reduced:
                    reduced.append(base)
            reduced.sort(key=lambda x: (x != "O", x))
            self.reduced_labels = reduced
            r2i = {l: i for i, l in enumerate(reduced)}
            self.id2reduced_id = {
                i: r2i["O" if lab == "O" else lab[2:]]
                for i, lab in self.id2label.items()
            }
        self.outside_id = self.reduced_labels.index("O")

    @property
    def total_size(self) -> int:
        """Padded sample width: text budget + 2 marker slots per pair
        (data_collator.py:52 semantics)."""
        return self.model_max_length + 2 * self.marker_max_length

    @property
    def num_reduced_labels(self) -> int:
        return len(self.reduced_labels)


#: default label set used by the synthetic KG pipeline (schemeless,
#: FewNERD-coarse-style — tests/constants.py:4 in the reference).
KG_LABELS = ["O", "location", "organization", "person", "product"]
