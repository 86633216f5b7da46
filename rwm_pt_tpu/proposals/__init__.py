"""Proposal distributions (TPU-native re-implementation of
``/root/reference/proposal_distributions/``)."""
from .proposals import (LaplaceProposal, NormalProposal, Proposal,
                        UniformRadiusProposal, create_proposal_distribution)

__all__ = ["Proposal", "NormalProposal", "LaplaceProposal",
           "UniformRadiusProposal", "create_proposal_distribution"]
