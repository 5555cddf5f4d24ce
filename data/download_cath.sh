#!/bin/bash
# Fetch the CATH non-redundant S40 dataset (cd into data/ first).
# Same source as the reference (data/download_cath.sh).
set -e
wget -P cath ftp://orengoftp.biochem.ucl.ac.uk/cath/releases/latest-release/non-redundant-data-sets/cath-dataset-nonredundant-S40.pdb.tgz
cd cath
tar -xzf cath-dataset-nonredundant-S40.pdb.tgz
