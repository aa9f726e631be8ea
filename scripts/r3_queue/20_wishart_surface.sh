#!/bin/bash
exec bash scripts/r3_wishart_surface.sh
