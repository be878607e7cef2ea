"""Reverse-translation helper for nucleotide-search tests (table 11 codons)."""

CODON = {
    "M": "atg", "A": "gct", "C": "tgt", "D": "gat", "E": "gaa", "F": "ttt",
    "G": "ggt", "H": "cat", "I": "atc", "K": "aaa", "L": "cta", "N": "aat",
    "P": "cct", "Q": "caa", "R": "cgt", "S": "tct", "T": "act", "V": "gta",
    "W": "tgg", "Y": "tat",
}


def encode_protein(prot: str) -> str:
    return "".join(CODON[a] for a in prot)
