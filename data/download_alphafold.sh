#!/bin/bash
# Fetch the AlphaFold SwissProt predicted structures (cd into data/ first).
set -e
mkdir -p alphafold
wget -P alphafold https://ftp.ebi.ac.uk/pub/databases/alphafold/latest/swissprot_pdb_v4.tar
cd alphafold
tar -xf swissprot_pdb_v4.tar
