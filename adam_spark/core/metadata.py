"""Genomic metadata model + JSON sidecar persistence.

Mirrors the reference's driver-resident metadata (SURVEY.md §1.1):
SequenceDictionary (reference: models/SequenceDictionary.scala:114),
ReadGroupDictionary (models/ReadGroupDictionary.scala:59), samples,
processing-step lineage and VCF header lines. The reference persists
these as Avro sidecars next to Parquet (GenomicDataset.scala:475-487);
we persist a single ``_metadata.json`` sidecar — driver-side only,
no data-path cost.

Union semantics (reference: GenomicDataset.scala:449-507): merging two
datasets unions their dictionaries, dropping exact duplicates and
failing on conflicting definitions of the same name.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field, replace

# NOTE: must not be named "_metadata*" — Parquet reserves that for its
# summary files and Spark would try to parse the sidecar as Parquet
SIDECAR_NAME = "_genomic_metadata.json"


@dataclass(frozen=True)
class Reference:
    """One contig of the reference genome (a SequenceDictionary entry)."""

    name: str
    length: int | None = None
    index: int | None = None
    md5: str | None = None
    url: str | None = None
    species: str | None = None


@dataclass(frozen=True)
class ReadGroup:
    id: str
    sampleId: str | None = None
    library: str | None = None
    platform: str | None = None
    platformUnit: str | None = None
    sequencingCenter: str | None = None
    description: str | None = None
    runDateEpoch: int | None = None
    flowOrder: str | None = None
    keySequence: str | None = None
    predictedMedianInsertSize: int | None = None


@dataclass(frozen=True)
class Sample:
    id: str
    name: str | None = None
    attributes: dict[str, str] = field(default_factory=dict)


@dataclass(frozen=True)
class ProcessingStep:
    id: str
    programName: str | None = None
    commandLine: str | None = None
    previousId: str | None = None
    description: str | None = None
    version: str | None = None


class SequenceDictionary:
    """Ordered contig dictionary with index-based sort support."""

    def __init__(self, references: list[Reference] | None = None):
        refs = list(references or [])
        # assign indices in order when absent (reference behavior: contigs
        # carry an ordering index used by position sorts)
        self.references: list[Reference] = [
            r if r.index is not None else replace(r, index=i) for i, r in enumerate(refs)
        ]
        self._by_name = {r.name: r for r in self.references}

    def __len__(self) -> int:
        return len(self.references)

    def __contains__(self, name: str) -> bool:
        return name in self._by_name

    def __getitem__(self, name: str) -> Reference:
        return self._by_name[name]

    def __eq__(self, other) -> bool:
        return isinstance(other, SequenceDictionary) and self.references == other.references

    def index_map(self) -> dict[str, int]:
        """contig name → sort index (for index-ordered genome sorts)."""
        return {r.name: (r.index if r.index is not None else i) for i, r in enumerate(self.references)}

    def total_length(self) -> int:
        return sum(r.length or 0 for r in self.references)

    def union(self, other: SequenceDictionary) -> SequenceDictionary:
        merged = list(self.references)
        names = {r.name for r in merged}
        for r in other.references:
            if r.name not in names:
                # re-index appended contigs to keep indices unique
                merged.append(replace(r, index=len(merged)))
                names.add(r.name)
            else:
                mine = self._by_name[r.name]
                if mine.length is not None and r.length is not None and mine.length != r.length:
                    raise ValueError(
                        f"conflicting lengths for contig {r.name}: {mine.length} vs {r.length}"
                    )
        return SequenceDictionary(merged)

    def is_compatible(self, other: "SequenceDictionary") -> bool:
        """Equality on the OVERLAP: dictionaries are compatible when
        every contig name they share has the same length
        (models/SequenceDictionary.scala isCompatible;
        SequenceDictionarySuite.scala:105-119 — same elements in a
        different order are compatible)."""
        for r in other.references:
            mine = self._by_name.get(r.name)
            if mine is not None and mine.length != r.length:
                return False
        return True

    def filter_to_reference_names(self, names) -> "SequenceDictionary":
        """Subset to the given contig names, keeping this dictionary's
        order (SequenceDictionarySuite.scala:232-274 filter tests);
        indices are reassigned to stay dense."""
        keep = set([names] if isinstance(names, str) else names)
        return SequenceDictionary(
            [replace(r, index=None) for r in self.references if r.name in keep]
        )

    @staticmethod
    def empty() -> SequenceDictionary:
        return SequenceDictionary([])


def _merge_unique(a: list, b: list, key) -> list:
    out = list(a)
    seen = {key(x) for x in a}
    for x in b:
        if key(x) not in seen:
            out.append(x)
            seen.add(key(x))
    return out


@dataclass
class GenomicMetadata:
    """All driver-side metadata for one GenomicFrame."""

    references: SequenceDictionary = field(default_factory=SequenceDictionary.empty)
    read_groups: list[ReadGroup] = field(default_factory=list)
    samples: list[Sample] = field(default_factory=list)
    processing_steps: list[ProcessingStep] = field(default_factory=list)
    header_lines: list[str] = field(default_factory=list)  # VCF header lines (raw strings)
    kind: str | None = None  # schema registry key, e.g. "alignment"

    def merge(self, other: GenomicMetadata) -> GenomicMetadata:
        """Union-merge for dataset unions (GenomicDataset.scala:490-507)."""
        return GenomicMetadata(
            references=self.references.union(other.references),
            read_groups=_merge_unique(self.read_groups, other.read_groups, lambda g: g.id),
            samples=_merge_unique(self.samples, other.samples, lambda s: s.id),
            processing_steps=_merge_unique(
                self.processing_steps, other.processing_steps, lambda p: p.id
            ),
            header_lines=_merge_unique(self.header_lines, other.header_lines, lambda h: h),
            kind=self.kind or other.kind,
        )

    def with_processing_step(self, step: ProcessingStep) -> GenomicMetadata:
        meta = self.copy()
        meta.processing_steps = [*self.processing_steps, step]
        return meta

    # --- metadata mutators (GenomicDataset.scala addX/replaceX families:
    # addReference(s) :421-446, addReadGroup(s) :3765-3788 via
    # ReadGroupsDatasets, addSample(s) :448-473, replaceX setters on the
    # copy constructors). Immutable style: each returns a new metadata. --
    def add_references(self, refs) -> GenomicMetadata:
        meta = self.copy()
        merged = _merge_unique(
            self.references.references, list(refs), lambda r: r.name
        )
        meta.references = SequenceDictionary(merged)
        return meta

    def replace_references(self, refs) -> GenomicMetadata:
        meta = self.copy()
        meta.references = (
            refs if isinstance(refs, SequenceDictionary)
            else SequenceDictionary(list(refs))
        )
        return meta

    def add_read_groups(self, groups) -> GenomicMetadata:
        meta = self.copy()
        meta.read_groups = _merge_unique(self.read_groups, list(groups), lambda g: g.id)
        return meta

    def replace_read_groups(self, groups) -> GenomicMetadata:
        meta = self.copy()
        meta.read_groups = list(groups)
        return meta

    def add_samples(self, samples) -> GenomicMetadata:
        meta = self.copy()
        meta.samples = _merge_unique(self.samples, list(samples), lambda s: s.id)
        return meta

    def replace_samples(self, samples) -> GenomicMetadata:
        meta = self.copy()
        meta.samples = list(samples)
        return meta

    def add_header_lines(self, lines) -> GenomicMetadata:
        meta = self
        for line in lines:
            meta = meta._with_header_line(line)
        return meta

    def replace_header_lines(self, lines) -> GenomicMetadata:
        meta = self.copy()
        meta.header_lines = list(lines)
        return meta

    def replace_processing_steps(self, steps) -> GenomicMetadata:
        meta = self.copy()
        meta.processing_steps = list(steps)
        return meta

    # --- VCF header-line surface (VCFSupportingGenomicDataset,
    # GenomicDataset.scala:3497-3757; Python mirror ds.py:628-848) ------
    def _with_header_line(self, line: str) -> GenomicMetadata:
        meta = self.copy()
        if line not in meta.header_lines:
            meta.header_lines = [*meta.header_lines, line]
        return meta

    def add_filter_header_line(self, fid: str, description: str) -> GenomicMetadata:
        return self._with_header_line(
            f'##FILTER=<ID={fid},Description="{description}">'
        )

    def add_scalar_format_header_line(
        self, fid: str, description: str, fmt_type: str = "Float"
    ) -> GenomicMetadata:
        return self._with_header_line(
            f'##FORMAT=<ID={fid},Number=1,Type={fmt_type},Description="{description}">'
        )

    def add_fixed_array_format_header_line(
        self, fid: str, count: int, description: str, fmt_type: str = "Float"
    ) -> GenomicMetadata:
        return self._with_header_line(
            f'##FORMAT=<ID={fid},Number={count},Type={fmt_type},Description="{description}">'
        )

    def add_genotype_array_format_header_line(
        self, fid: str, description: str, fmt_type: str = "Float"
    ) -> GenomicMetadata:
        return self._with_header_line(
            f'##FORMAT=<ID={fid},Number=G,Type={fmt_type},Description="{description}">'
        )

    def add_alternate_allele_array_format_header_line(
        self, fid: str, description: str, fmt_type: str = "Float"
    ) -> GenomicMetadata:
        return self._with_header_line(
            f'##FORMAT=<ID={fid},Number=A,Type={fmt_type},Description="{description}">'
        )

    def add_scalar_info_header_line(
        self, iid: str, description: str, info_type: str = "Float"
    ) -> GenomicMetadata:
        return self._with_header_line(
            f'##INFO=<ID={iid},Number=1,Type={info_type},Description="{description}">'
        )

    def add_fixed_array_info_header_line(
        self, iid: str, count: int, description: str, info_type: str = "Float"
    ) -> GenomicMetadata:
        return self._with_header_line(
            f'##INFO=<ID={iid},Number={count},Type={info_type},Description="{description}">'
        )

    def add_alternate_allele_array_info_header_line(
        self, iid: str, description: str, info_type: str = "Float"
    ) -> GenomicMetadata:
        return self._with_header_line(
            f'##INFO=<ID={iid},Number=A,Type={info_type},Description="{description}">'
        )

    def add_all_alleles_array_info_header_line(
        self, iid: str, description: str, info_type: str = "Float"
    ) -> GenomicMetadata:
        return self._with_header_line(
            f'##INFO=<ID={iid},Number=R,Type={info_type},Description="{description}">'
        )

    def add_all_alleles_array_format_header_line(
        self, fid: str, description: str, fmt_type: str = "Float"
    ) -> GenomicMetadata:
        return self._with_header_line(
            f'##FORMAT=<ID={fid},Number=R,Type={fmt_type},Description="{description}">'
        )

    def copy(self) -> GenomicMetadata:
        return GenomicMetadata(
            references=SequenceDictionary(self.references.references),
            read_groups=list(self.read_groups),
            samples=list(self.samples),
            processing_steps=list(self.processing_steps),
            header_lines=list(self.header_lines),
            kind=self.kind,
        )

    # --- sidecar IO -------------------------------------------------------
    def to_dict(self) -> dict:
        return {
            "references": [asdict(r) for r in self.references.references],
            "readGroups": [asdict(g) for g in self.read_groups],
            "samples": [asdict(s) for s in self.samples],
            "processingSteps": [asdict(p) for p in self.processing_steps],
            "headerLines": list(self.header_lines),
            "kind": self.kind,
        }

    @staticmethod
    def from_dict(d: dict) -> GenomicMetadata:
        return GenomicMetadata(
            references=SequenceDictionary([Reference(**r) for r in d.get("references", [])]),
            read_groups=[ReadGroup(**g) for g in d.get("readGroups", [])],
            samples=[Sample(**s) for s in d.get("samples", [])],
            processing_steps=[ProcessingStep(**p) for p in d.get("processingSteps", [])],
            header_lines=list(d.get("headerLines", [])),
            kind=d.get("kind"),
        )

    def save(self, dataset_path: str) -> None:
        os.makedirs(dataset_path, exist_ok=True)
        with open(os.path.join(dataset_path, SIDECAR_NAME), "w") as f:
            json.dump(self.to_dict(), f, indent=1, sort_keys=True)

    @staticmethod
    def load(dataset_path: str) -> GenomicMetadata:
        p = os.path.join(dataset_path, SIDECAR_NAME)
        if not os.path.exists(p):
            return GenomicMetadata()
        with open(p) as f:
            return GenomicMetadata.from_dict(json.load(f))
